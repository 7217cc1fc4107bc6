"""Invertible channel-mixing layers: permutations and LU 1x1 "convolution".

Reference parity: ``ReverseSeqFlow`` / ``InvertibleConv`` in
``layers/flows/permutation_layers.py`` (SURVEY.md C4).

The invertible 1x1 is LU-parameterised (GLOW): W = P @ L @ (U + diag(s)),
so the log-det is just sum(log|s|) and both directions are triangular
solves — but since channel counts here are tiny (D <= ~16), we materialise
W and W^{-1} once per step; XLA turns the [*, D] @ [D, D] contraction into
an MXU matmul batched over all positions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import Transform, sum_ldj

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ReverseChannels(Transform):
    """Deterministic channel-order reversal (zero-cost, ldj = 0)."""

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        return {}

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        return z[..., ::-1], ldj

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        return z[..., ::-1], ldj


@dataclasses.dataclass(frozen=True)
class InvertibleLinear(Transform):
    """LU-parameterised invertible channel mixing (GLOW 1x1).

    The diagonal log-scales are tanh-capped: unbounded channel scaling is
    an fp32-resolution escape hatch (see flows/softclamp.py).
    """

    scale_cap: float = 5.0

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        # Random rotation start, decomposed into P L U.
        w = jax.random.orthogonal(rng, event_dim)
        import jax.scipy.linalg as jsl
        p, l, u = jsl.lu(w)
        s = jnp.diagonal(u)
        return {
            "perm": p.astype(jnp.float32),  # fixed permutation (not trained)
            "lower": l.astype(jnp.float32),
            "upper": jnp.triu(u, k=1).astype(jnp.float32),
            "sign_s": jnp.sign(s).astype(jnp.float32),  # fixed
            "log_s": jnp.log(jnp.abs(s) + 1e-12).astype(jnp.float32),
        }

    def _ls(self, params):
        return self.scale_cap * jnp.tanh(params["log_s"] / self.scale_cap)

    def _weight(self, params):
        d = params["log_s"].shape[0]
        eye = jnp.eye(d, dtype=jnp.float32)
        l = jnp.tril(params["lower"], k=-1) + eye
        # perm and sign_s are FIXED buffers living in the params PyTree:
        # stop_gradient keeps the optimizer from training them into
        # arbitrary matrices whose determinant the ldj formula does not
        # account for (that exploit produced claimed-vs-true logdet gaps
        # of ~15 nats/layer and ELBO > 0).
        perm = jax.lax.stop_gradient(params["perm"])
        sign_s = jax.lax.stop_gradient(params["sign_s"])
        u = jnp.triu(params["upper"], k=1) + jnp.diag(
            sign_s * jnp.exp(self._ls(params)))
        return perm @ l @ u

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        w = self._weight(params)
        z32 = jnp.asarray(z, jnp.float32)
        out = jnp.einsum("...d,de->...e", z32, w,
                         precision=jax.lax.Precision.HIGHEST)
        per = jnp.broadcast_to(self._ls(params), out.shape)
        return out, ldj + sum_ldj(per, mask)

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        w = self._weight(params)
        w_inv = jnp.linalg.inv(w)
        z32 = jnp.asarray(z, jnp.float32)
        out = jnp.einsum("...d,de->...e", z32, w_inv,
                         precision=jax.lax.Precision.HIGHEST)
        per = jnp.broadcast_to(self._ls(params), out.shape)
        return out, ldj - sum_ldj(per, mask)
