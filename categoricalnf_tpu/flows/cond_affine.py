"""Affine transform whose parameters come from a conditioning network.

Used inside the linear-flows encoding (SURVEY.md C11): the per-category
flows get their shift/scale from the category embedding.  Equivalent role
to the reference's ``ExtActNormFlow`` (SURVEY.md C3) but with the small
conditioning MLP owned by the layer itself.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import Transform, sum_ldj
from categoricalnf_tpu.networks.common import dense, dense_init

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ConditionalAffine(Transform):
    hidden_dim: int = 32
    scale_cap: float = 3.0

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        k1, k2 = jax.random.split(rng)
        return {
            "fc1": dense_init(k1, cond_dim, self.hidden_dim),
            "fc2": dense_init(k2, self.hidden_dim, 2 * event_dim, zero=True),
        }

    def _affine(self, params, cond, d):
        h = jax.nn.gelu(dense(params["fc1"], cond, jnp.float32))
        raw = dense(params["fc2"], h, jnp.float32)
        bias = raw[..., :d]
        log_scale = self.scale_cap * jnp.tanh(raw[..., d:] / self.scale_cap)
        return bias, log_scale

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        bias, log_scale = self._affine(params, cond, z.shape[-1])
        z = (z + bias) * jnp.exp(log_scale)
        return z, ldj + sum_ldj(log_scale, mask)

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        bias, log_scale = self._affine(params, cond, z.shape[-1])
        z = z * jnp.exp(-log_scale) - bias
        return z, ldj - sum_ldj(log_scale, mask)
