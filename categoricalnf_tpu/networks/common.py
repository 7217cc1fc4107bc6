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
    """Dense layer with bf16 MXU compute, fp32 accumulate + fp32 out."""
    w = params["w"].astype(compute_dtype)
    y = jax.lax.dot_general(
        x.astype(compute_dtype), w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y + params["b"]


def layer_norm(x: Array, eps: float = 1e-5) -> Array:
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps)


def concat_cond(x: Array, cond) -> Array:
    if cond is None:
        return x
    cond = jnp.broadcast_to(cond, x.shape[:-1] + (cond.shape[-1],))
    return jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
