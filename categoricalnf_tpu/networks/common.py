"""Shared building blocks for coupling networks.

All networks follow one protocol (SURVEY.md C15/C16 rebuilt):

    params = net.init(rng, in_dim, out_dim, cond_dim)
    y      = net.apply(params, x, cond=None, mask=None)   # [B, T, out_dim]

Parameters are fp32; matmuls optionally run in bf16 with fp32 accumulation
(``preferred_element_type``) — the TPU MXU's native mode.  The final
projection of every network is zero-initialised so freshly built coupling
layers are exact identities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def dense_init(rng: jax.Array, in_dim: int, out_dim: int, *,
               scale: float = 1.0, zero: bool = False):
    if zero:
        w = jnp.zeros((in_dim, out_dim), jnp.float32)
    else:
        std = scale / jnp.sqrt(jnp.maximum(in_dim, 1)).astype(jnp.float32)
        w = jax.random.normal(rng, (in_dim, out_dim), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((out_dim,), jnp.float32)}


def dense(params, x: Array, compute_dtype=jnp.bfloat16) -> Array:
    """Dense layer: bf16 MXU compute, fp32 accumulate, compute-dtype out.

    The output is cast to ``compute_dtype`` AFTER the fp32 accumulation +
    bias add.  Materializing activations in the compute dtype matters as
    much as computing in it: the flagship step is HBM-traffic-bound
    (dispatch_diagnostic: 10.3 GB accessed/step, 45% of v5e bandwidth,
    MXU work 0.17 ms of a 28 ms step), and the pre-fix fp32 outputs made
    every residual/LN/gelu tensor twice as wide as the declared bf16
    stream.  fp32 carries that must stay fp32 (LSTM cell state, coupling
    transform math) are protected by JAX promotion or explicit casts at
    the consumer.
    """
    w = params["w"].astype(compute_dtype)
    y = jax.lax.dot_general(
        x.astype(compute_dtype), w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y + params["b"]).astype(compute_dtype)


def layer_norm(x: Array, eps: float = 1e-5) -> Array:
    """LN with fp32 statistics, output in the input's dtype."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def concat_cond(x: Array, cond) -> Array:
    if cond is None:
        return x
    cond = jnp.broadcast_to(cond, x.shape[:-1] + (cond.shape[-1],))
    return jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
