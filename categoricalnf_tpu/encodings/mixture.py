"""Mixture-model encoding — the paper's core contribution (§3.1).

Reference parity: ``layers/categorical_encoding/mixture_model.py``
(SURVEY.md C10).  Each category c owns a factorized logistic
q(z|c) = Π_d Logistic(mu[c,d], sigma[c,d]); the decoder has NO parameters
of its own — it is the Bayes posterior

    p(x=c | z) = p̃(c) q(z|c) / Σ_c' p̃(c') q(z|c')

with a learned categorical prior p̃.  The partition function is one
logsumexp over a [B, T, K] log-prob tensor — a single fused VPU reduction
on TPU.  Everything here is embedding lookups + elementwise math; under
jit it fuses into the surrounding flow computation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.encodings.base import Encoding
from categoricalnf_tpu.flows.base import sum_ldj
from categoricalnf_tpu.ops import numerics as nm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MixtureEncoding(Encoding):
    init_scale: float = 1.0
    init_log_sigma: float = -2.0
    # Posterior scales are clamped to [min_log_sigma, max_log_sigma].  The
    # lower bound keeps q(z|x) wider than fp32 resolution — without it the
    # optimiser collapses sigma below float precision, continuous densities
    # stop being densities, and the ELBO diverges past 0 (negative "bpd").
    min_log_sigma: float = -4.6  # sigma >= 0.01
    max_log_sigma: float = 2.3
    # "bayes" (parameter-free posterior decoder, the paper default) or a
    # learned decoder ablation: "linear" / "mlp" (SURVEY.md C13).
    decoder: str = "bayes"

    def _learned_decoder(self):
        from categoricalnf_tpu.encodings.decoders import create_decoder
        return create_decoder(self.decoder, self.num_categories, self.dim)

    def init(self, rng: jax.Array):
        k_mu, k_dec = jax.random.split(rng)
        K, D = self.num_categories, self.dim
        params = {
            "means": jax.random.normal(k_mu, (K, D)) * self.init_scale,
            "log_scales": jnp.full((K, D), self.init_log_sigma, jnp.float32),
            "prior_logits": jnp.zeros((K,), jnp.float32),
        }
        if self.decoder != "bayes":
            params["decoder"] = self._learned_decoder().init(k_dec)
        return params

    def _ls(self, raw):
        return jnp.clip(raw, self.min_log_sigma, self.max_log_sigma)

    def encode(self, params, x, rng, *, mask=None):
        mu = params["means"][x]            # [B, T, D]
        ls = self._ls(params["log_scales"][x])
        z = nm.logistic_sample(rng, mu.shape, mean=mu, log_scale=ls)
        log_q = sum_ldj(nm.logistic_log_pdf(z, mu, ls), mask)
        return z, log_q

    def _log_joint_all(self, params, z):
        """log p̃(c) + log q(z|c) for all categories: [B, T, K]."""
        mu = params["means"]               # [K, D]
        ls = self._ls(params["log_scales"])
        comp = nm.logistic_log_pdf(z[..., None, :], mu, ls).sum(-1)  # [B,T,K]
        log_prior = jax.nn.log_softmax(params["prior_logits"])
        return comp + log_prior

    def log_decoder(self, params, x, z, *, mask=None):
        if self.decoder != "bayes":
            return self._learned_decoder().log_prob(params["decoder"], x, z,
                                                    mask=mask)
        log_joint = self._log_joint_all(params, z)
        log_norm = jax.scipy.special.logsumexp(log_joint, axis=-1)
        log_post = jnp.take_along_axis(
            log_joint, x[..., None], axis=-1)[..., 0] - log_norm
        return sum_ldj(log_post, mask)

    def decode(self, params, z, *, mask=None):
        if self.decoder != "bayes":
            return self._learned_decoder().decode(params["decoder"], z)
        return jnp.argmax(self._log_joint_all(params, z), axis=-1)

    def posterior(self, params, z):
        """Full categorical posterior p(x|z): [B, T, K] probabilities."""
        return jax.nn.softmax(self._log_joint_all(params, z), axis=-1)
