"""Mixture-CDF coupling layer — the framework's hot path.

Reference parity: ``MixtureCDFCoupling`` + ``CouplingLayer`` mask logic in
``layers/flows/mixture_cdf_layer.py`` / ``coupling_layer.py`` (SURVEY.md
C5/C6).  Flow++-style transform on the masked-out elements:

    y = logit(MixLogisticCDF(x)) * exp(a) + t

with per-element ldj ``log mixpdf - log F - log (1-F) + a``, all evaluated
in fused log-space (`ops.numerics.mixture_logit_cdf_and_ldj`).  The inverse
runs the bracketed bisection + Newton root-find — closed-form bracket, fixed
iteration count, fully vectorised (`ops.numerics.mixture_inverse_logit_cdf`).

Masks are static binary patterns over channels or positions; the coupling
network sees ``z * m`` (masked-in elements) plus conditioning and emits
``2 + 3K`` raw parameters per element.  Zero-initialised network output
yields the exact identity transform (single-logistic CDF composed with
logit), so deep stacks start stable; per-(dim, K) learned mean offsets
break mixture-component symmetry.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import Transform, sum_ldj
from categoricalnf_tpu.ops import numerics as nm

Array = jax.Array


def make_channel_mask(event_dim: int, parity: int) -> Array:
    """[D] mask: 1 = conditioning (kept), 0 = transformed."""
    idx = jnp.arange(event_dim)
    m = (idx < (event_dim + 1) // 2).astype(jnp.float32)
    return m if parity == 0 else 1.0 - m


def make_checker_mask(num_pos: int, parity: int) -> Array:
    """[T] alternating position mask: 1 = conditioning, 0 = transformed."""
    m = (jnp.arange(num_pos) % 2 == 0).astype(jnp.float32)
    return m if parity == 0 else 1.0 - m


@dataclasses.dataclass(frozen=True)
class MixtureCDFCoupling(Transform):
    """Coupling with mixture-of-logistics CDF transform.

    Attributes:
      net: coupling network (init/apply protocol, see networks package).
      mask_kind: "channel" (split channels) or "checker" (alternate
        positions — reference's chess mask for sequences).
      parity: which half is conditioning.
      num_mixtures: K logistics per transformed element.
      scale_cap: tanh cap for the affine log-scale term.
    """

    net: Any = None
    mask_kind: str = "channel"
    parity: int = 0
    num_mixtures: int = 8
    scale_cap: float = 3.0

    def _mask(self, z: Array) -> Array:
        if self.mask_kind == "channel":
            return make_channel_mask(z.shape[-1], self.parity)[None, None, :]
        elif self.mask_kind == "checker":
            return make_checker_mask(z.shape[-2], self.parity)[None, :, None]
        raise ValueError(f"unknown mask kind {self.mask_kind}")

    def init(self, rng, event_dim: int, cond_dim: int = 0):
        k_net, k_mu = jax.random.split(rng)
        K = self.num_mixtures
        out_dim = event_dim * (2 + 3 * K)
        net_params = self.net.init(k_net, event_dim, out_dim, cond_dim)
        # Per-(channel, K) mean offsets break component symmetry at init.
        mean_offsets = jax.random.normal(k_mu, (event_dim, K)) * 0.5
        return {"net": net_params, "mean_offsets": mean_offsets}

    def _params_for(self, params, z, cond, mask):
        """Run the coupling net; reshape raw output to transform params."""
        m = self._mask(z)
        net_in = z * m
        raw = self.net.apply(params["net"], net_in, cond=cond, mask=mask)
        D, K = z.shape[-1], self.num_mixtures
        raw = raw.reshape(*z.shape, 2 + 3 * K).astype(jnp.float32)
        t = raw[..., 0]
        a = self.scale_cap * jnp.tanh(raw[..., 1] / self.scale_cap)
        pi_logits = raw[..., 2:2 + K]
        means = raw[..., 2 + K:2 + 2 * K] + params["mean_offsets"]
        log_scales = raw[..., 2 + 2 * K:]
        return m, t, a, pi_logits, means, log_scales

    def forward(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        m, t, a, pi, mu, ls = self._params_for(params, z, cond, mask)
        z32 = jnp.asarray(z, jnp.float32)
        y, elem_ldj = nm.mixture_logit_cdf_and_ldj(z32, pi, mu, ls)
        y = y * jnp.exp(a) + t
        out = m * z32 + (1.0 - m) * y
        per = (elem_ldj + a) * (1.0 - m)
        return out, ldj + sum_ldj(per, mask)

    def inverse(self, params, z, ldj, *, cond=None, mask=None, rng=None):
        # Net input z*m is untouched by the transform, so a single pass
        # suffices (no per-channel sequential loop).
        from categoricalnf_tpu.ops.dispatch import mixture_inverse
        m, t, a, pi, mu, ls = self._params_for(params, z, cond, mask)
        z32 = jnp.asarray(z, jnp.float32)
        u = (z32 - t) * jnp.exp(-a)
        x = mixture_inverse(u, pi, mu, ls)
        out = m * z32 + (1.0 - m) * x
        _, elem_ldj = nm.mixture_logit_cdf_and_ldj(x, pi, mu, ls)
        per = (elem_ldj + a) * (1.0 - m)
        return out, ldj - sum_ldj(per, mask)
