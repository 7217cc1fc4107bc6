"""Linear-flows encoding: per-category distributions via conditional flows.

Reference parity: ``LinearCategoricalEncoding`` in
``layers/categorical_encoding/linear_encoding.py`` (SURVEY.md C11, paper
§3.1).  Generalises the mixture encoding: q(z|c) is a standard logistic
pushed through a small flow conditioned on the category embedding.  The
Bayes decoder costs O(K) flow evaluations; here K is folded into a vmapped
category axis so all K evaluations run as one large batched computation
(SURVEY.md §7 hard part 5).

Positions are independent under the encoding (q factorises over t), so
[B, T] is flattened into the batch axis around every flow call and the
per-position log-density comes back exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.encodings.base import Encoding
from categoricalnf_tpu.flows.base import sum_ldj
from categoricalnf_tpu.flows.cond_affine import ConditionalAffine
from categoricalnf_tpu.flows.coupling import MixtureCDFCoupling
from categoricalnf_tpu.flows.distributions import LogisticPrior
from categoricalnf_tpu.flows.linear import InvertibleLinear
from categoricalnf_tpu.flows.model import FlowModel
from categoricalnf_tpu.flows.softclamp import SoftClamp
from categoricalnf_tpu.networks.mlp import MLP

Array = jax.Array


def default_encoding_flow(dim: int, num_blocks: int = 2,
                          hidden_dim: int = 64, num_mixtures: int = 4,
                          compute_dtype: str = "float32") -> FlowModel:
    net = MLP(hidden_dim=hidden_dim, num_layers=2,
              compute_dtype=compute_dtype)
    layers = []
    for _ in range(num_blocks):
        layers.append(InvertibleLinear())
        layers.append(ConditionalAffine())
        layers.append(MixtureCDFCoupling(net=net, mask_kind="channel",
                                         parity=0, num_mixtures=num_mixtures))
        layers.append(MixtureCDFCoupling(net=net, mask_kind="channel",
                                         parity=1, num_mixtures=num_mixtures))
        layers.append(SoftClamp())
    return FlowModel(layers=tuple(layers), prior=LogisticPrior())


@dataclasses.dataclass(frozen=True)
class LinearFlowEncoding(Encoding):
    embed_dim: int = 16
    num_blocks: int = 2
    hidden_dim: int = 64
    num_mixtures: int = 4
    compute_dtype: str = "float32"

    @property
    def flow(self) -> FlowModel:
        return default_encoding_flow(self.dim, self.num_blocks,
                                     self.hidden_dim, self.num_mixtures,
                                     self.compute_dtype)

    def init(self, rng: jax.Array):
        k_emb, k_flow = jax.random.split(rng)
        return {
            "embed": jax.random.normal(
                k_emb, (self.num_categories, self.embed_dim)) * 0.5,
            "flow": self.flow.init(k_flow, self.dim, self.embed_dim),
            "prior_logits": jnp.zeros((self.num_categories,), jnp.float32),
        }

    # -- helpers ----------------------------------------------------------

    def _flat(self, x):  # [B, T, ...] -> [B*T, 1, ...]
        return x.reshape(-1, 1, x.shape[-1])

    def encode(self, params, x, rng, *, mask=None):
        B, T = x.shape
        flow = self.flow
        emb = self._flat(params["embed"][x])               # [BT, 1, E]
        eps = flow.prior.sample(rng, (B * T, 1, self.dim))
        z_flat, ldj_inv = flow.inverse(params["flow"], eps, cond=emb)
        # log q(z|x) = log base(eps) + ldj_fwd = log base(eps) - ldj_inv
        log_q_pos = (flow.prior.log_prob(eps) - ldj_inv).reshape(B, T)
        z = z_flat.reshape(B, T, self.dim)
        return z, sum_ldj(log_q_pos, mask)

    def _log_q_all(self, params, z):
        """log q(z_t | c) for every category: [B, T, K]."""
        B, T, D = z.shape
        flow = self.flow
        z_flat = self._flat(z)

        def per_cat(emb_c):
            cond = jnp.broadcast_to(emb_c, (B * T, 1, self.embed_dim))
            eps, ldj = flow.forward(params["flow"], z_flat, cond=cond)
            return flow.prior.log_prob(eps) + ldj   # [BT]

        log_q = jax.vmap(per_cat)(params["embed"])  # [K, BT]
        return log_q.T.reshape(B, T, self.num_categories)

    def log_decoder(self, params, x, z, *, mask=None):
        log_joint = self._log_q_all(params, z) + jax.nn.log_softmax(
            params["prior_logits"])
        log_norm = jax.scipy.special.logsumexp(log_joint, axis=-1)
        log_post = jnp.take_along_axis(
            log_joint, x[..., None], axis=-1)[..., 0] - log_norm
        return sum_ldj(log_post, mask)

    def decode(self, params, z, *, mask=None):
        log_joint = self._log_q_all(params, z) + jax.nn.log_softmax(
            params["prior_logits"])
        return jnp.argmax(log_joint, axis=-1)
