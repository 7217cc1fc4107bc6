"""Causal transformer coupling network for time-autoregressive flows.

TPU-native alternative to the reference's LSTM coupling nets (SURVEY.md
C15): the density/training pass is ONE batched causal-attention stack —
no sequential scan at all, every FLOP an MXU matmul — where the LSTM
keeps a [B,H]x[H,4H] recurrence per timestep.  Sampling exposes the same
``init_carry`` / ``step`` API as :class:`CausalLSTM`, with a fixed-shape
KV cache written by ``lax.dynamic_update_slice`` so the sequential
ancestral rollout stays jit-compatible (static shapes, SURVEY.md §3.3).

Causality contract (identical to CausalLSTM): with ``shift=True`` the
output at position t depends only on inputs at positions < t; ``step``
consumes x_{t-1} and returns the head output for position t.  ``extra``
(the masked-in channels of the CURRENT step, used by the
coupling-in-channels AR transform) joins after the attention stack, just
before the output head.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.networks.common import (concat_cond, dense, dense_init,
                                               layer_norm)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CausalTransformer:
    hidden_dim: int = 256
    num_heads: int = 4
    num_layers: int = 2
    mlp_ratio: int = 2
    max_len: int = 512  # KV-cache capacity; apply() accepts any T <= max_len
    extra_dim: int = 0
    compute_dtype: str = "bfloat16"

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def _head_dim(self):
        assert self.hidden_dim % self.num_heads == 0
        return self.hidden_dim // self.num_heads

    def init(self, rng, in_dim: int, out_dim: int, cond_dim: int = 0):
        h = self.hidden_dim
        ks = jax.random.split(rng, 3 + self.num_layers)
        params = {
            "embed": dense_init(ks[0], in_dim + cond_dim, h),
            "pos": jax.random.normal(ks[1], (self.max_len, h)) * 0.02,
            "out": dense_init(ks[2], h + self.extra_dim, out_dim, zero=True),
            "blocks": [],
        }
        for i in range(self.num_layers):
            bk = jax.random.split(ks[3 + i], 5)
            params["blocks"].append({
                "qkv": dense_init(bk[0], h, 3 * h),
                "proj": dense_init(bk[1], h, h, scale=0.5),
                "fc1": dense_init(bk[2], h, self.mlp_ratio * h),
                "fc2": dense_init(bk[3], self.mlp_ratio * h, h, scale=0.5),
            })
        return params

    # -- full-sequence (density/training) ---------------------------------

    def _qkv(self, bp, h):
        B, T, H = h.shape
        nh, hd = self.num_heads, self._head_dim
        qkv = dense(bp["qkv"], layer_norm(h), self._dtype)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, nh, hd), 3, axis=2)
        return (t.squeeze(2) for t in (q, k, v))  # each [B, T, nh, hd]

    def _mlp(self, bp, h):
        m = jax.nn.gelu(dense(bp["fc1"], layer_norm(h), self._dtype))
        return dense(bp["fc2"], m, self._dtype)

    def apply(self, params, x, cond=None, mask=None, *, shift: bool = True,
              extra=None):
        B, T, _ = x.shape
        if T > self.max_len:
            raise ValueError(f"T={T} exceeds max_len={self.max_len}")
        h = concat_cond(x, cond)
        if shift:
            h = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1)
        h = dense(params["embed"], h, self._dtype) \
            + params["pos"][:T].astype(self._dtype)
        causal = jnp.tril(jnp.ones((T, T), bool))
        if mask is not None:
            causal = causal & jnp.asarray(mask, bool)[:, None, :]
        for bp in params["blocks"]:
            q, k, v = self._qkv(bp, h)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(self._dtype),
                                k.astype(self._dtype),
                                preferred_element_type=jnp.float32)
            logits = logits / jnp.sqrt(jnp.float32(self._head_dim))
            logits = jnp.where(jnp.broadcast_to(
                causal if causal.ndim == 3 else causal[None],
                (B, T, T))[:, None], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self._dtype),
                           v.astype(self._dtype),
                           preferred_element_type=jnp.float32)
            h = h + dense(bp["proj"], o.reshape(B, T, -1), self._dtype)
            h = h + self._mlp(bp, h)
        h = layer_norm(h)
        if extra is not None:
            h = jnp.concatenate([h, jnp.asarray(extra, h.dtype)], axis=-1)
        return dense(params["out"], h, self._dtype)

    # -- sequential (sampling) ---------------------------------------------

    def init_carry(self, batch: int):
        nh, hd = self.num_heads, self._head_dim
        caches = [{"k": jnp.zeros((batch, self.max_len, nh, hd), jnp.float32),
                   "v": jnp.zeros((batch, self.max_len, nh, hd), jnp.float32)}
                  for _ in range(self.num_layers)]
        return (caches, jnp.zeros((), jnp.int32))

    def step(self, params, carry, x_t: Array, cond_t=None, extra_t=None):
        """One timestep: x_t = x_{t-1} [B, in] -> (carry, out_t [B, out])."""
        caches, pos = carry
        B = x_t.shape[0]
        nh, hd = self.num_heads, self._head_dim
        h = concat_cond(x_t, cond_t)
        h = dense(params["embed"], h, self._dtype) + jax.lax.dynamic_index_in_dim(
            params["pos"], pos, axis=0, keepdims=False).astype(self._dtype)
        key_mask = (jnp.arange(self.max_len) <= pos)[None, None, :]  # [1,1,L]
        new_caches = []
        for bp, cache in zip(params["blocks"], caches):
            qkv = dense(bp["qkv"], layer_norm(h), self._dtype)
            q, k, v = jnp.split(qkv.reshape(B, 3, nh, hd), 3, axis=1)
            q, k, v = q.squeeze(1), k.squeeze(1), v.squeeze(1)  # [B, nh, hd]
            kc = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(jnp.float32)[:, None], (0, pos, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(jnp.float32)[:, None], (0, pos, 0, 0))
            new_caches.append({"k": kc, "v": vc})
            logits = jnp.einsum("bhd,blhd->bhl", q.astype(self._dtype),
                                kc.astype(self._dtype),
                                preferred_element_type=jnp.float32)
            logits = logits / jnp.sqrt(jnp.float32(hd))
            logits = jnp.where(key_mask, logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhl,blhd->bhd", attn.astype(self._dtype),
                           vc.astype(self._dtype),
                           preferred_element_type=jnp.float32)
            h = h + dense(bp["proj"], o.reshape(B, -1), self._dtype)
            h = h + self._mlp(bp, h)
        h = layer_norm(h)
        if extra_t is not None:
            h = jnp.concatenate([h, jnp.asarray(extra_t, h.dtype)], axis=-1)
        return (new_caches, pos + 1), dense(params["out"], h, self._dtype)
