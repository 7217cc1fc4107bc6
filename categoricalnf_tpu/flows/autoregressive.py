"""Time-autoregressive mixture-CDF transform (language-modeling flows).

Reference parity: the LM flow layers built from time-autoregressive LSTM
coupling nets (SURVEY.md C5 + C15, paper §4.2).  All channels at timestep t
are transformed conditioned on timesteps < t:

  - density/training: ONE causal pass (LSTM scan with right-shifted input),
    fully parallel over batch and channels — the TPU-friendly direction;
  - sampling: inherently sequential in t; implemented as a ``lax.scan``
    carrying the LSTM state, with the bisection inverse vectorised over
    batch and channels inside each step (SURVEY.md §3.3 hot loop).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import Transform, sum_ldj
from categoricalnf_tpu.ops import numerics as nm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AutoregressiveMixtureCDF(Transform):
    """z_t -> logit(MixLogCDF(z_t)) * e^a + t, params from causal net.

    With ``parity=None`` all channels at step t transform conditioned only
    on steps < t (channels conditionally independent within a step).  With
    an integer parity, the layer is ALSO a coupling in channels (the
    reference's LM design, SURVEY.md C5+C15): the masked-in half of z_t
    stays identity and joins the LSTM state as extra conditioning for the
    transformed half — within-timestep joint structure at no cost to the
    parallel density pass, and the sequential inverse still works because
    the masked-in channels of z_t equal those of y_t.
    """

    net: Any = None  # must expose apply(shift=True, extra=), init_carry, step
    num_mixtures: int = 8
    scale_cap: float = 3.0
    parity: int | None = None
    # Learned soft-classifier features of the net INPUT (i.e. of z_{t-1}
    # after the causal shift): a V-component Gaussian-mixture posterior
    # softmax concatenated to the raw latents.  Motivation: for mixture
    # encodings the conditional p(z_t | z_{<t}) is a vocab-sized mixture
    # keyed on WHICH encoder mode z_{t-1} sits in — a quadratic decision
    # the LSTM's linear gates recover only weakly (diagnosed as the lm_v4
    # expressivity gap).  A deterministic smooth function of the input is
    # identical in the density pass and the sequential inverse, so
    # generation consistency and the ldj are untouched.
    input_feats: int = 0

    def _chan_mask(self, event_dim: int):
        if self.parity is None:
            return jnp.zeros((event_dim,), jnp.float32)
        from categoricalnf_tpu.flows.coupling import make_channel_mask
        return make_channel_mask(event_dim, self.parity)

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        k_net, k_mu, k_feat = jax.random.split(rng, 3)
        K = self.num_mixtures
        out_dim = event_dim * (2 + 3 * K)
        net_params = self.net.init(k_net, event_dim + self.input_feats,
                                   out_dim, cond_dim)
        mean_offsets = jax.random.normal(k_mu, (event_dim, K)) * 0.5
        params = {"net": net_params, "mean_offsets": mean_offsets}
        if self.input_feats:
            params["feat"] = {
                "mu": jax.random.normal(k_feat,
                                        (self.input_feats, event_dim)),
                "log_sigma": jnp.zeros((self.input_feats, event_dim)),
                "bias": jnp.zeros((self.input_feats,)),
            }
        return params

    def _net_input(self, params, z: Array) -> Array:
        """Concat the soft-classifier features onto the net input.

        Works on [..., D] (full sequence in forward, one step in inverse);
        at t=0 both directions see an all-zero input (the forward shift
        zeroes the CONCATENATED vector, and the inverse carry starts from
        zeros of the concatenated width)."""
        if not self.input_feats:
            return z
        f = params["feat"]
        # clamp like every other learned log-scale (CLAUDE.md numerics
        # discipline): unbounded exp(-log_sigma) could overflow the
        # squared distance to inf and NaN the softmax.
        ls = jnp.clip(f["log_sigma"], nm.LOG_SCALE_MIN, nm.LOG_SCALE_MAX)
        inv = jnp.exp(-ls)                                  # [V, D]
        diff = (z[..., None, :] - f["mu"]) * inv            # [..., V, D]
        logits = -0.5 * (diff * diff).sum(-1) + f["bias"]   # [..., V]
        return jnp.concatenate([z, jax.nn.softmax(logits, axis=-1)], axis=-1)

    def _split_raw(self, params, raw, shape):
        K = self.num_mixtures
        raw = raw.reshape(*shape, 2 + 3 * K).astype(jnp.float32)
        t = raw[..., 0]
        a = self.scale_cap * jnp.tanh(raw[..., 1] / self.scale_cap)
        pi_logits = raw[..., 2:2 + K]
        means = raw[..., 2 + K:2 + 2 * K] + params["mean_offsets"]
        log_scales = raw[..., 2 + 2 * K:]
        return t, a, pi_logits, means, log_scales

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        z32 = jnp.asarray(z, jnp.float32)
        m = self._chan_mask(z32.shape[-1])
        extra = z32 * m if self.parity is not None else None
        raw = self.net.apply(params["net"], self._net_input(params, z32),
                             cond=cond, mask=mask, shift=True, extra=extra)
        t, a, pi, mu, ls = self._split_raw(params, raw, z32.shape)
        y, elem_ldj = nm.mixture_logit_cdf_and_ldj(z32, pi, mu, ls)
        out = (1.0 - m) * (y * jnp.exp(a) + t) + m * z32
        return out, ldj + sum_ldj((elem_ldj + a) * (1.0 - m), mask)

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        B, T, D = z.shape
        z32 = jnp.asarray(z, jnp.float32)
        m = self._chan_mask(D)
        cond_seq = (None if cond is None
                    else jnp.broadcast_to(cond, (B, T, cond.shape[-1])))

        def step(carry, inputs):
            net_carry, inp_prev = carry
            y_t, cond_t = inputs
            # masked-in channels pass through unchanged: z_t*m == y_t*m
            extra_t = y_t * m if self.parity is not None else None
            net_carry, raw = self.net.step(params["net"], net_carry,
                                           inp_prev, cond_t, extra_t)
            from categoricalnf_tpu.ops.dispatch import mixture_inverse
            t, a, pi, mu, ls = self._split_raw(params, raw, (B, D))
            u = (y_t - t) * jnp.exp(-a)
            x_inv = mixture_inverse(u, pi, mu, ls)
            x_t = (1.0 - m) * x_inv + m * y_t
            _, elem_ldj = nm.mixture_logit_cdf_and_ldj(x_inv, pi, mu, ls)
            per = ((elem_ldj + a) * (1.0 - m)).sum(axis=-1)
            return (net_carry, self._net_input(params, x_t)), (x_t, per)

        init = (self.net.init_carry(B),
                jnp.zeros((B, D + self.input_feats), jnp.float32))
        ys = z32.transpose(1, 0, 2)
        conds = (cond_seq.transpose(1, 0, 2) if cond_seq is not None
                 else jnp.zeros((T, B, 0), jnp.float32))
        (_, _), (xs, ldjs) = jax.lax.scan(step, init, (ys, conds))
        x = xs.transpose(1, 0, 2)
        per_t = ldjs.transpose(1, 0)  # [B, T]
        return x, ldj - sum_ldj(per_t, mask)
