"""Causal LSTM coupling network for time-autoregressive flows (LM tasks).

Reference parity: the time-autoregressive LSTM coupling nets in
``layers/networks/autoregressive_layers.py`` (SURVEY.md C15, paper §4.2).

Training/likelihood runs the whole sequence in one ``lax.scan`` (teacher
forcing — fully parallel across batch, sequential only in T with a cheap
cell).  Sampling uses the exposed ``init_carry`` / ``step`` API so the
autoregressive transform can roll the state one token at a time
(SURVEY.md §3.3 "LM sampling is sequential in time").

The input gate matmul [B, in] @ [in, 4H] is MXU-shaped; the scan carries
only the (h, c) state.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.networks.common import concat_cond, dense, dense_init

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CausalLSTM:
    hidden_dim: int = 256
    num_layers: int = 1
    # extra per-step features fed ONLY to the output head (used by the
    # coupling-in-channels AR transform: the masked-in channels of the
    # CURRENT timestep join the recurrent state from PAST timesteps).
    extra_dim: int = 0
    compute_dtype: str = "bfloat16"

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    def init(self, rng, in_dim: int, out_dim: int, cond_dim: int = 0):
        ks = jax.random.split(rng, 2 * self.num_layers + 1)
        cells = []
        d = in_dim + cond_dim
        for i in range(self.num_layers):
            cells.append({
                "wx": dense_init(ks[2 * i], d, 4 * self.hidden_dim),
                "wh": dense_init(ks[2 * i + 1], self.hidden_dim,
                                 4 * self.hidden_dim),
            })
            d = self.hidden_dim
        return {
            "cells": cells,
            "out": dense_init(ks[-1], self.hidden_dim + self.extra_dim,
                              out_dim, zero=True),
        }

    def init_carry(self, batch: int):
        h = jnp.zeros((batch, self.hidden_dim), jnp.float32)
        return [(h, h) for _ in range(self.num_layers)]

    def _cell(self, cp, carry, x):
        h_prev, c_prev = carry
        gates = dense(cp["wx"], x, self._dtype) + dense(cp["wh"], h_prev,
                                                        self._dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f + 1.0) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    def step(self, params, carry, x_t: Array, cond_t=None, extra_t=None):
        """One timestep: x_t [B, in] -> (new_carry, out [B, out_dim])."""
        h = concat_cond(x_t, cond_t)
        new_carry = []
        for cp, c in zip(params["cells"], carry):
            c2, h = self._cell(cp, c, h)
            new_carry.append(c2)
        if extra_t is not None:
            h = jnp.concatenate([h, jnp.asarray(extra_t, h.dtype)], axis=-1)
        return new_carry, dense(params["out"], h, self._dtype)

    def _cell_pre(self, cp, carry, gx):
        """Cell step with the input-side gates precomputed."""
        h_prev, c_prev = carry
        gates = gx + dense(cp["wh"], h_prev, self._dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f + 1.0) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    def apply(self, params, x, cond=None, mask=None, *, shift: bool = True,
              extra=None):
        """Full-sequence causal application.

        With ``shift=True`` (default) the output at position t depends only
        on inputs at positions < t (strict causality for autoregressive
        flows): the input sequence is right-shifted with a zero first step.

        TPU layout: the input-side gate projection for EVERY layer is
        hoisted out of the scan as one large [B*T, in] @ [in, 4H] MXU
        matmul; only the recurrent [B, H] @ [H, 4H] product remains
        sequential.  Halves in-scan FLOPs and keeps the big matmul at MXU-
        friendly shape.
        """
        B, T, _ = x.shape
        h = concat_cond(x, cond)
        if shift:
            h = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1)

        def scan_layer(cp, seq):
            """seq: [T, B, in] -> [T, B, H] for one LSTM layer."""
            gx = dense(cp["wx"], seq, self._dtype)  # hoisted input gates

            def scan_fn(carry, gx_t):
                carry, h_t = self._cell_pre(cp, carry, gx_t)
                return carry, h_t

            h0 = jnp.zeros((B, self.hidden_dim), jnp.float32)
            _, hs = jax.lax.scan(scan_fn, (h0, h0), gx)
            return hs

        seq = h.transpose(1, 0, 2)
        for cp in params["cells"]:
            seq = scan_layer(cp, seq)
        hs = seq.transpose(1, 0, 2)
        if extra is not None:
            hs = jnp.concatenate([hs, jnp.asarray(extra, hs.dtype)], axis=-1)
        return dense(params["out"], hs, self._dtype)
