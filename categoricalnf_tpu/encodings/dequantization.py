"""Variational dequantization encoding (ordinal baseline).

Reference parity: ``VariationalDequantization`` in
``layers/categorical_encoding/variational_dequantization.py`` (SURVEY.md
C12, paper §2).  z = x + u with u ∈ (0,1) drawn from a conditional flow
q(u|x); the decoder is deterministic rounding (log p(x|z) = 0 on the unit
cell).  Included because the mixture-vs-dequant comparison is the paper's
headline ablation.

The dequant flow maps u → logit(u) → conditional couplings → logistic
base.  Sampling runs the stack in reverse from base noise, accumulating
the ldj so log q(u|x) comes out of the same pass.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.encodings.base import Encoding
from categoricalnf_tpu.flows.cond_affine import ConditionalAffine
from categoricalnf_tpu.flows.coupling import MixtureCDFCoupling
from categoricalnf_tpu.flows.distributions import LogisticPrior
from categoricalnf_tpu.flows.model import FlowModel
from categoricalnf_tpu.flows.sigmoid import Logit
from categoricalnf_tpu.networks.mlp import MLP

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VariationalDequantization(Encoding):
    """dim is forced to 1: one ordinal continuous dim per variable."""

    embed_dim: int = 16
    num_blocks: int = 2
    hidden_dim: int = 64
    num_mixtures: int = 4
    compute_dtype: str = "float32"

    @property
    def flow(self) -> FlowModel:
        net = MLP(hidden_dim=self.hidden_dim, num_layers=2,
                  compute_dtype=self.compute_dtype)
        layers = [Logit()]
        for parity in range(self.num_blocks):
            layers.append(ConditionalAffine())
            # dim==1: couple across the (single) channel using checker masks
            # over the dequant dimension is degenerate, so condition purely
            # on the category embedding via conditional affines + elementwise
            # mixture CDF with parameters from the embedding.
            layers.append(MixtureCDFCoupling(
                net=MLP(hidden_dim=self.hidden_dim, num_layers=2,
                        compute_dtype=self.compute_dtype),
                mask_kind="checker", parity=parity % 2,
                num_mixtures=self.num_mixtures))
        return FlowModel(layers=tuple(layers), prior=LogisticPrior())

    def init(self, rng: jax.Array):
        k_emb, k_flow = jax.random.split(rng)
        return {
            "embed": jax.random.normal(
                k_emb, (self.num_categories, self.embed_dim)) * 0.5,
            "flow": self.flow.init(k_flow, 1, self.embed_dim),
        }

    def encode(self, params, x, rng, *, mask=None):
        B, T = x.shape
        flow = self.flow
        emb = params["embed"][x]  # [B, T, E]
        # Dequant noise lives on [B, T, 1]; positions paired via checker mask.
        eps = flow.prior.sample(rng, (B, T, 1))
        u, ldj_inv = flow.inverse(params["flow"], eps, cond=emb, mask=mask)
        log_q = flow.prior.log_prob(eps, mask) - ldj_inv
        x_f = x.astype(jnp.float32)[..., None]
        z = x_f + jnp.clip(u, 1e-5, 1.0 - 1e-5)
        return z, log_q

    def log_decoder(self, params, x, z, *, mask=None):
        # Deterministic rounding decoder: log p(x|z) = 0 inside the cell.
        return jnp.zeros(z.shape[0], jnp.float32)

    def decode(self, params, z, *, mask=None):
        x = jnp.floor(z[..., 0]).astype(jnp.int32)
        return jnp.clip(x, 0, self.num_categories - 1)
