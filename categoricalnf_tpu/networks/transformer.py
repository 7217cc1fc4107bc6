"""Permutation-equivariant transformer coupling network (set tasks).

Reference parity: the set experiments' coupling backbone (SURVEY.md C15).
No positional embeddings — attention over set elements must stay
permutation-equivariant.  Variable-size sets are handled with the validity
mask (attention logits of invalid keys are -inf).  Attention matmuls run in
bf16 with fp32 accumulation (MXU native); softmax in fp32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.networks.common import (concat_cond, dense, dense_init,
                                               layer_norm)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SetTransformer:
    hidden_dim: int = 128
    num_heads: int = 4
    num_layers: int = 2
    mlp_ratio: int = 2
    compute_dtype: str = "bfloat16"
    # fused=True routes the whole net (embed -> blocks -> out) through one
    # Pallas kernel per direction (ops/pallas/fused_transformer.py): the
    # XLA path materializes ~20 intermediate [B,S,H] tensors in HBM per
    # coupling layer, which dominates the memory-bound flagship step.
    # Falls back to the XLA path whenever cond/mask are present or the
    # batch doesn't tile.
    fused: bool = False

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    def init(self, rng, in_dim: int, out_dim: int, cond_dim: int = 0):
        h = self.hidden_dim
        ks = jax.random.split(rng, 2 + self.num_layers)
        params = {
            "embed": dense_init(ks[0], in_dim + cond_dim, h),
            "out": dense_init(ks[1], h, out_dim, zero=True),
            "blocks": [],
        }
        for i in range(self.num_layers):
            bk = jax.random.split(ks[2 + i], 5)
            params["blocks"].append({
                "qkv": dense_init(bk[0], h, 3 * h),
                "proj": dense_init(bk[1], h, h, scale=0.5),
                "fc1": dense_init(bk[2], h, self.mlp_ratio * h),
                "fc2": dense_init(bk[3], self.mlp_ratio * h, h, scale=0.5),
            })
        return params

    def _attention(self, bp, h, mask):
        B, T, H = h.shape
        nh, hd = self.num_heads, H // self.num_heads
        qkv = dense(bp["qkv"], layer_norm(h), self._dtype)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, nh, hd), 3, axis=2)
        q, k, v = (t.squeeze(2).transpose(0, 2, 1, 3) for t in (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(self._dtype),
                            k.astype(self._dtype),
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(hd))
        if mask is not None:
            key_mask = jnp.asarray(mask, bool)[:, None, None, :]
            logits = jnp.where(key_mask, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self._dtype),
                         v.astype(self._dtype),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, H)
        return dense(bp["proj"], out, self._dtype)

    def apply(self, params, x, cond=None, mask=None):
        if self.fused:
            from categoricalnf_tpu.ops.pallas import fused_transformer as ft
            if ft.supported(x, cond, mask, self.hidden_dim, self.num_heads):
                return ft.fused_set_transformer(
                    params, x, hidden_dim=self.hidden_dim,
                    num_heads=self.num_heads, num_layers=self.num_layers,
                    mlp_ratio=self.mlp_ratio,
                    compute_dtype=self.compute_dtype,
                    out_dim=params["out"]["w"].shape[-1])
        h = dense(params["embed"], concat_cond(x, cond), self._dtype)
        for bp in params["blocks"]:
            h = h + self._attention(bp, h, mask)
            m = jax.nn.gelu(dense(bp["fc1"], layer_norm(h), self._dtype))
            h = h + dense(bp["fc2"], m, self._dtype)
        return dense(params["out"], layer_norm(h), self._dtype)
