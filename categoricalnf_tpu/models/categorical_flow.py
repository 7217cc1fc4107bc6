"""CategoricalFlow: encoding + continuous flow + prior, end to end.

Reference parity: the per-task flow assemblies plus the ELBO wiring in
``general/task.py`` (SURVEY.md C19):

    log p(x) >= E_{q(z|x)} [ log p(z) + log p(x|z) - log q(z|x) ]

with ``log p(z)`` the flow+prior density, ``log p(x|z)`` the encoding's
decoder, and ``log q(z|x)`` the encoding density.  Bits per categorical
variable divides by the (masked) variable count and ln 2.

Importance-sampled evaluation (SURVEY.md §3.2) draws S posterior samples
and tightens the bound with a logsumexp; the sample axis is a leading
vmap axis so the whole evaluation stays one jitted computation and can be
sharded over devices.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from categoricalnf_tpu.encodings.base import Encoding
from categoricalnf_tpu.flows.model import FlowModel

Array = jax.Array
LN2 = 0.6931471805599453


def _num_vars(x: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return jnp.full((x.shape[0],), float(x.shape[1]), jnp.float32)
    return jnp.asarray(mask, jnp.float32).sum(axis=1)


@dataclasses.dataclass(frozen=True)
class CategoricalFlow:
    encoding: Encoding
    flow: FlowModel
    cond_dim: int = 0

    def init(self, rng: jax.Array):
        k_enc, k_flow = jax.random.split(rng)
        return {
            "encoding": self.encoding.init(k_enc),
            "flow": self.flow.init(k_flow, self.encoding.dim, self.cond_dim),
        }

    # -- training objective ----------------------------------------------

    def elbo(self, params, x: Array, rng: jax.Array, *,
             cond=None, mask=None) -> dict[str, Array]:
        """Single-sample ELBO parts, per batch element."""
        z, log_q = self.encoding.encode(params["encoding"], x, rng, mask=mask)
        log_pz = self.flow.log_prob(params["flow"], z, cond=cond, mask=mask)
        log_dec = self.encoding.log_decoder(params["encoding"], x, z,
                                            mask=mask)
        elbo = log_pz + log_dec - log_q
        return {"elbo": elbo, "log_pz": log_pz, "log_dec": log_dec,
                "log_q": log_q}

    def loss_bpd(self, params, x: Array, rng: jax.Array, *,
                 cond=None, mask=None, beta: float | Array = 1.0) -> Array:
        """Mean bits/variable; ``beta`` anneals the posterior term.

        Includes a positive-ELBO guard: E_q[log p/q] <= 0 holds for any
        normalised density, so a positive BATCH-MEAN ELBO certifies that
        the flow is exploiting a numerical gap between its claimed ldj and
        the actual fp32 map.  The quadratic penalty points the gradient
        straight back out of that regime (inert in legitimate training).
        """
        parts = self.elbo(params, x, rng, cond=cond, mask=mask)
        obj = parts["log_pz"] + parts["log_dec"] - beta * parts["log_q"]
        n = _num_vars(x, mask)
        loss = jnp.mean(-obj / (n * LN2))
        cheat = jax.nn.relu(jnp.mean(parts["elbo"] / (n * LN2)))
        return loss + 10.0 * cheat * cheat

    # -- evaluation -------------------------------------------------------

    def iw_log_prob(self, params, x: Array, rng: jax.Array,
                    num_samples: int, *, cond=None, mask=None) -> Array:
        """Importance-sampled log p(x) bound, per batch element [B].

        Chains are evaluated in vmapped chunks under ``lax.map`` so large
        IS counts (post-hoc IS-128 bounds) keep peak memory at the
        chunk's working set instead of materialising all S ELBO graphs
        at once (IS-128 on the LM flow OOM'd a 16 GB chip otherwise);
        the logsumexp over all S chains is unchanged.
        """
        keys = jax.random.split(rng, num_samples)

        def one(key):
            return self.elbo(params, x, key, cond=cond, mask=mask)["elbo"]

        chunk = num_samples if num_samples % 16 else 16
        if num_samples <= chunk:
            elbos = jax.vmap(one)(keys)           # [S, B]
        else:
            elbos = jax.lax.map(
                jax.vmap(one),
                keys.reshape(num_samples // chunk, chunk,
                             *keys.shape[1:])).reshape(num_samples, -1)
        return (jax.scipy.special.logsumexp(elbos, axis=0)
                - jnp.log(float(num_samples)))

    def eval_bpd(self, params, x: Array, rng: jax.Array,
                 num_samples: int = 1, *, cond=None, mask=None) -> Array:
        ll = self.iw_log_prob(params, x, rng, num_samples, cond=cond,
                              mask=mask)
        return -ll / (_num_vars(x, mask) * LN2)

    # -- sampling ---------------------------------------------------------

    def sample(self, params, rng: jax.Array, batch: int, num_pos: int, *,
               cond=None, mask=None, temperature: float = 1.0) -> Array:
        k_prior, k_dec = jax.random.split(rng)
        shape = (batch, num_pos, self.encoding.dim)
        z = self.flow.sample(params["flow"], k_prior, shape, cond=cond,
                             mask=mask, temperature=temperature)
        return self.encoding.decode(params["encoding"], z, mask=mask)

    # -- data-dependent init ---------------------------------------------

    def data_init(self, params, x: Array, rng: jax.Array, *,
                  cond=None, mask=None):
        """Calibration pass: actnorm layers absorb activation statistics."""
        z, _ = self.encoding.encode(params["encoding"], x, rng, mask=mask)
        new_flow = self.flow.data_init(params["flow"], z, cond=cond,
                                       mask=mask)
        return {**params, "flow": new_flow}
