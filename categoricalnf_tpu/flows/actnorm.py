"""Activation normalization (GLOW-style) with masked data-dependent init.

Reference parity: ``ActNormFlow`` / ``ExtActNormFlow`` in
``layers/flows/activation_normalization.py`` (SURVEY.md C3).

``ActNorm``: per-channel affine ``y = (z + bias) * exp(log_scale)`` whose
parameters are initialised from the first calibration batch so the output
has zero mean / unit variance per channel (masked statistics for
variable-length data).

``ExtActNorm``: the bias/log-scale come from an external conditioning
network instead of free parameters — used inside encodings where the
normalisation must depend on the category.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import Transform, sum_ldj

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ActNorm(Transform):
    has_data_init: bool = dataclasses.field(default=True, init=False, repr=False)
    # tanh cap on the learned log-scale: unbounded per-layer scaling lets
    # activations outrun fp32 resolution (see flows/softclamp.py).
    scale_cap: float = 5.0

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        return {
            "bias": jnp.zeros((event_dim,), jnp.float32),
            "log_scale": jnp.zeros((event_dim,), jnp.float32),
        }

    def _ls(self, params):
        return self.scale_cap * jnp.tanh(params["log_scale"] / self.scale_cap)

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        ls = self._ls(params)
        z = (z + params["bias"]) * jnp.exp(ls)
        per = jnp.broadcast_to(ls, z.shape)
        return z, ldj + sum_ldj(per, mask)

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        ls = self._ls(params)
        z = z * jnp.exp(-ls) - params["bias"]
        per = jnp.broadcast_to(ls, z.shape)
        return z, ldj - sum_ldj(per, mask)

    def data_init(self, params, z, *, cond=None, mask=None):
        mean, var = _masked_moments(z, mask)
        target_ls = jnp.clip(-0.5 * jnp.log(var + 1e-6),
                             -self.scale_cap + 0.1, self.scale_cap - 0.1)
        params = {
            "bias": -mean,
            # invert the tanh cap so the effective scale hits the target
            "log_scale": self.scale_cap * jnp.arctanh(
                target_ls / self.scale_cap),
        }
        z, _ = self.forward(params, z, jnp.zeros(z.shape[0], jnp.float32),
                            mask=mask)
        return params, z


def _masked_moments(z: Array, mask: Optional[Array]) -> tuple[Array, Array]:
    """Per-channel mean/var over batch and positions, honouring the mask."""
    z = jnp.asarray(z, jnp.float32)
    flat = z.reshape(-1, z.shape[-1])
    if mask is None:
        mean = flat.mean(axis=0)
        var = flat.var(axis=0)
    else:
        m = jnp.asarray(mask, jnp.float32).reshape(-1, 1)
        denom = jnp.maximum(m.sum(), 1.0)
        mean = (flat * m).sum(axis=0) / denom
        var = ((flat - mean) ** 2 * m).sum(axis=0) / denom
    return mean, var


@dataclasses.dataclass(frozen=True)
class ExtActNorm(Transform):
    """Affine whose (bias, log_scale) are supplied via ``cond``.

    ``cond`` must carry ``2 * D`` channels: the first D are the bias, the
    last D the raw log-scale (squashed through tanh * scale_cap for
    stability).  Used by the linear-flows encoding (SURVEY.md C11).
    """

    scale_cap: float = 3.0

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        return {}

    def _split(self, cond, d):
        bias, raw = cond[..., :d], cond[..., d:2 * d]
        log_scale = self.scale_cap * jnp.tanh(raw / self.scale_cap)
        return bias, log_scale

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        bias, log_scale = self._split(cond, z.shape[-1])
        z = (z + bias) * jnp.exp(log_scale)
        return z, ldj + sum_ldj(log_scale, mask)

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        bias, log_scale = self._split(cond, z.shape[-1])
        z = z * jnp.exp(-log_scale) - bias
        return z, ldj - sum_ldj(log_scale, mask)
