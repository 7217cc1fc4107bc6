"""Learned decoders — ablation alternative to the Bayes posterior decoder.

Reference parity: ``DecoderLinear`` / ``DecoderMLP`` in
``layers/categorical_encoding/decoder.py`` (SURVEY.md C13).  p(x|z) is an
independent per-position softmax network.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import sum_ldj
from categoricalnf_tpu.networks.common import dense, dense_init

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LinearDecoder:
    num_categories: int
    dim: int

    def init(self, rng):
        return {"out": dense_init(rng, self.dim, self.num_categories)}

    def logits(self, params, z):
        return dense(params["out"], jnp.asarray(z, jnp.float32), jnp.float32)

    def log_prob(self, params, x, z, *, mask=None):
        logp = jax.nn.log_softmax(self.logits(params, z), axis=-1)
        sel = jnp.take_along_axis(logp, x[..., None], axis=-1)[..., 0]
        return sum_ldj(sel, mask)

    def decode(self, params, z):
        return jnp.argmax(self.logits(params, z), axis=-1)


@dataclasses.dataclass(frozen=True)
class MLPDecoder:
    num_categories: int
    dim: int
    hidden_dim: int = 64

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "fc1": dense_init(k1, self.dim, self.hidden_dim),
            "out": dense_init(k2, self.hidden_dim, self.num_categories),
        }

    def logits(self, params, z):
        h = jax.nn.gelu(dense(params["fc1"], jnp.asarray(z, jnp.float32),
                              jnp.float32))
        return dense(params["out"], h, jnp.float32)

    def log_prob(self, params, x, z, *, mask=None):
        logp = jax.nn.log_softmax(self.logits(params, z), axis=-1)
        sel = jnp.take_along_axis(logp, x[..., None], axis=-1)[..., 0]
        return sum_ldj(sel, mask)

    def decode(self, params, z):
        return jnp.argmax(self.logits(params, z), axis=-1)


def create_decoder(name: str, num_categories: int, dim: int, **kw):
    if name == "linear":
        return LinearDecoder(num_categories, dim)
    if name == "mlp":
        return MLPDecoder(num_categories, dim, **kw)
    raise ValueError(f"unknown decoder {name!r}")
