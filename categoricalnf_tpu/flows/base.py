"""Transform protocol — the framework's L1 contract.

Reference parity: mirrors the capability of ``FlowLayer`` in the reference's
``layers/flows/flow_layer.py`` (SURVEY.md C1) but is expressed functionally:
a Transform object is *static configuration* (hashable, safe to close over
under jit) while parameters live in an explicit PyTree, so every method is a
pure function and composes with jit / grad / vmap / pjit without any module
machinery.

Conventions
-----------
- ``z``: activations shaped ``[B, T, D]`` (batch, positions, channels).
- ``ldj``: running log-det-Jacobian, shaped ``[B]``, float32.
- ``forward`` maps data toward the prior (normalizing direction);
  ``inverse`` is the sampling direction.  The reference folds both into one
  ``forward(..., reverse=)`` flag; two explicit methods let jit trace each
  direction separately (the inverse contains a root-find loop that must not
  be traced into the training step).
- ``mask``: optional ``[B, T]`` float/bool validity mask for variable-length
  data; ldj contributions and statistics must respect it.
- ``cond``: optional conditioning tensor(s) broadcastable to ``[B, T, C]``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Any  # a PyTree of arrays


def sum_ldj(per_elem: Array, mask: Optional[Array]) -> Array:
    """Reduce a per-element ldj tensor [B, T, D] (or [B, T]) to [B]."""
    per_elem = jnp.asarray(per_elem, jnp.float32)
    if mask is not None:
        m = jnp.asarray(mask, jnp.float32)
        while m.ndim < per_elem.ndim:
            m = m[..., None]
        per_elem = per_elem * m
    return per_elem.reshape(per_elem.shape[0], -1).sum(axis=1)


def apply_mask(z: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return z
    m = jnp.asarray(mask, z.dtype)
    while m.ndim < z.ndim:
        m = m[..., None]
    return z * m


@dataclasses.dataclass(frozen=True)
class Transform:
    """Base class.  Subclasses are frozen dataclasses = static jit config."""

    has_data_init: bool = dataclasses.field(default=False, init=False, repr=False)

    def init(self, rng: jax.Array, event_dim: int, cond_dim: int = 0) -> Params:
        raise NotImplementedError

    def forward(self, params: Params, z: Array, ldj: Array, *,
                cond: Optional[Array] = None, mask: Optional[Array] = None,
                rng: Optional[jax.Array] = None) -> tuple[Array, Array]:
        raise NotImplementedError

    def inverse(self, params: Params, z: Array, ldj: Array, *,
                cond: Optional[Array] = None, mask: Optional[Array] = None,
                rng: Optional[jax.Array] = None) -> tuple[Array, Array]:
        raise NotImplementedError

    def data_init(self, params: Params, z: Array, *,
                  cond: Optional[Array] = None,
                  mask: Optional[Array] = None) -> tuple[Params, Array]:
        """Data-dependent init: return updated params and forwarded z."""
        z, _ = self.forward(params, z, jnp.zeros(z.shape[0], jnp.float32),
                            cond=cond, mask=mask)
        return params, z
