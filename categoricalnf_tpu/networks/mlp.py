"""Per-position MLP coupling network (no cross-position mixing)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.networks.common import concat_cond, dense, dense_init


@dataclasses.dataclass(frozen=True)
class MLP:
    hidden_dim: int = 128
    num_layers: int = 2
    compute_dtype: str = "bfloat16"

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    def init(self, rng, in_dim: int, out_dim: int, cond_dim: int = 0):
        dims = ([in_dim + cond_dim] + [self.hidden_dim] * self.num_layers
                + [out_dim])
        params = []
        for i in range(len(dims) - 1):
            params.append(dense_init(jax.random.fold_in(rng, i), dims[i],
                                     dims[i + 1], zero=(i == len(dims) - 2)))
        return tuple(params)

    def apply(self, params, x, cond=None, mask=None):
        h = concat_cond(x, cond)
        for i, p in enumerate(params):
            h = dense(p, h, self._dtype)
            if i < len(params) - 1:
                h = jax.nn.gelu(h)
        return h
