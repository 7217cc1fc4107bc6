"""ScannedBlocks: repeat a block of transforms under ``lax.scan``.

SURVEY.md §7.1: "Composition = scan/fori over a homogeneous stack where
possible".  Deep flows repeat an identical block (actnorm → 1×1 →
coupling → softclamp) N times; tracing it once and scanning over stacked
parameters cuts XLA trace/compile work by ~N× (the dominant cost of the
big set/graph stacks through the TPU tunnel: ~8 min → ~1-2 min) with
identical runtime semantics.

The inverse scans the stacked parameters in reverse; data-dependent init
runs un-scanned (it is inherently sequential over depth) by slicing the
stacked PyTrees per block.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import Transform

Array = jax.Array


def _slice_d(tree, d):
    return jax.tree.map(lambda a: a[d], tree)


@dataclasses.dataclass(frozen=True)
class ScannedBlocks(Transform):
    """``remat=True`` wraps the scan body in ``jax.checkpoint``: backward
    recomputes each block's activations instead of storing depth× of them
    — the standard TPU memory/FLOPs trade (HBM is the bottleneck).  On
    by default for the GraphCNF flows, whose scaled configs (hidden 256,
    batch 192, E=276 edge slots) otherwise want ~2× a v5e's 16 GB HBM
    for stored coupling-net activations."""

    block: tuple[Transform, ...] = ()
    depth: int = 1
    remat: bool = False
    # lax.scan unroll factor: >1 lets XLA fuse across block boundaries
    # (fewer, larger fusions -> fewer HBM round-trips on the
    # memory-bound step) at the cost of unroll x compile size.  A perf
    # lever for the hbm_util attack (VERDICT r4 #4); semantics identical
    # for any value.
    unroll: int = 1
    has_data_init: bool = dataclasses.field(default=True, init=False,
                                            repr=False)

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        per_layer = []
        for li, layer in enumerate(self.block):
            stacked = [
                layer.init(jax.random.fold_in(rng, 1000 * d + li),
                           event_dim, cond_dim)
                for d in range(self.depth)
            ]
            per_layer.append(jax.tree.map(
                lambda *xs: jnp.stack(xs), *stacked))
        return tuple(per_layer)

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        def body(carry, block_params):
            z, ldj = carry
            for layer, p in zip(self.block, block_params):
                z, ldj = layer.forward(p, z, ldj, cond=cond, mask=mask)
            return (z, ldj), None

        if self.remat:
            body = jax.checkpoint(body)
        (z, ldj), _ = jax.lax.scan(body, (z, ldj), params,
                                   unroll=self.unroll)
        return z, ldj

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        def body(carry, block_params):
            z, ldj = carry
            for layer, p in zip(reversed(self.block),
                                reversed(list(block_params))):
                z, ldj = layer.inverse(p, z, ldj, cond=cond, mask=mask)
            return (z, ldj), None

        if self.remat:
            body = jax.checkpoint(body)
        (z, ldj), _ = jax.lax.scan(body, (z, ldj), params, reverse=True,
                                   unroll=self.unroll)
        return z, ldj

    def data_init(self, params, z, *, cond=None, mask=None):
        new_stacks: list[list] = [[] for _ in self.block]
        for d in range(self.depth):
            for li, layer in enumerate(self.block):
                p_d = _slice_d(params[li], d)
                if layer.has_data_init:
                    p_d, z = layer.data_init(p_d, z, cond=cond, mask=mask)
                else:
                    z, _ = layer.forward(
                        p_d, z, jnp.zeros(z.shape[0], jnp.float32),
                        cond=cond, mask=mask)
                new_stacks[li].append(p_d)
        stacked = tuple(
            jax.tree.map(lambda *xs: jnp.stack(xs), *st)
            for st in new_stacks)
        return stacked, z
