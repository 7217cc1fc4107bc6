"""Sigmoid / logit bijection between the real line and (0, 1).

Reference parity: sigmoid flow in ``layers/flows/sigmoid_layer.py``
(SURVEY.md C7).  ldj of sigmoid is ``log_sigmoid(x) + log_sigmoid(-x)``;
inputs to the logit direction are clipped a hair inside (0, 1) so fp32
never produces infs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import Transform, sum_ldj


@dataclasses.dataclass(frozen=True)
class Sigmoid(Transform):
    """forward: R -> (0,1) via sigmoid; inverse: logit."""

    eps: float = 1e-6

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        return {}

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        z32 = jnp.asarray(z, jnp.float32)
        per = jax.nn.log_sigmoid(z32) + jax.nn.log_sigmoid(-z32)
        return jax.nn.sigmoid(z32), ldj + sum_ldj(per, mask)

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        z32 = jnp.clip(jnp.asarray(z, jnp.float32), self.eps, 1.0 - self.eps)
        x = jnp.log(z32) - jnp.log1p(-z32)
        per = jax.nn.log_sigmoid(x) + jax.nn.log_sigmoid(-x)
        return x, ldj - sum_ldj(per, mask)


@dataclasses.dataclass(frozen=True)
class Logit(Transform):
    """forward: (0,1) -> R via logit (the reverse orientation of Sigmoid)."""

    eps: float = 1e-6

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        return {}

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        z32 = jnp.clip(jnp.asarray(z, jnp.float32), self.eps, 1.0 - self.eps)
        x = jnp.log(z32) - jnp.log1p(-z32)
        per = jax.nn.log_sigmoid(x) + jax.nn.log_sigmoid(-x)
        return x, ldj - sum_ldj(per, mask)

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        z32 = jnp.asarray(z, jnp.float32)
        per = jax.nn.log_sigmoid(z32) + jax.nn.log_sigmoid(-z32)
        return jax.nn.sigmoid(z32), ldj + sum_ldj(per, mask)
