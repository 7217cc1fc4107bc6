"""Flow composition: an ordered stack of Transforms plus a prior.

Reference parity: ``FlowModel`` in ``layers/flows/flow_model.py``
(SURVEY.md C2): runs layers forward/inverse accumulating the ldj, performs
the data-dependent init pass, and samples by drawing from the prior and
running the stack in reverse.

The layer tuple is static configuration; parameters are an explicit tuple
of PyTrees, so a ``FlowModel`` method closed over the model object is a
pure function of (params, inputs) — jit/pjit/grad compose directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import Transform
from categoricalnf_tpu.flows.distributions import LogisticPrior

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FlowModel:
    layers: tuple[Transform, ...]
    prior: Any = LogisticPrior()

    @property
    def _parametric_prior(self) -> bool:
        """Parametric priors (e.g. HMMPrior) expose ``init`` and take
        their param PyTree as the first argument of log_prob/sample;
        their params ride as one trailing entry of the flow param tuple
        (so the optimizer trains them with the layers for free)."""
        return hasattr(self.prior, "init")

    def _split(self, params):
        if self._parametric_prior:
            return params[: len(self.layers)], params[-1]
        return params, None

    def init(self, rng: jax.Array, event_dim: int, cond_dim: int = 0):
        params = []
        for i, layer in enumerate(self.layers):
            params.append(layer.init(jax.random.fold_in(rng, i), event_dim,
                                     cond_dim))
        if self._parametric_prior:
            params.append(self.prior.init(
                jax.random.fold_in(rng, 0x7FFFFFFF), event_dim))
        return tuple(params)

    def forward(self, params, z: Array, ldj: Optional[Array] = None, *,
                cond=None, mask=None, rng=None):
        """Data -> prior direction; returns (z_K, ldj)."""
        lp, _ = self._split(params)
        if ldj is None:
            ldj = jnp.zeros(z.shape[0], jnp.float32)
        for i, (layer, p) in enumerate(zip(self.layers, lp)):
            sub = None if rng is None else jax.random.fold_in(rng, i)
            z, ldj = layer.forward(p, z, ldj, cond=cond, mask=mask, rng=sub)
        return z, ldj

    def inverse(self, params, z: Array, ldj: Optional[Array] = None, *,
                cond=None, mask=None, rng=None):
        """Prior -> data direction (sampling)."""
        lp, _ = self._split(params)
        if ldj is None:
            ldj = jnp.zeros(z.shape[0], jnp.float32)
        for layer, p in zip(reversed(self.layers), reversed(list(lp))):
            z, ldj = layer.inverse(p, z, ldj, cond=cond, mask=mask, rng=rng)
        return z, ldj

    def log_prob(self, params, z0: Array, *, cond=None, mask=None) -> Array:
        _, pp = self._split(params)
        zk, ldj = self.forward(params, z0, cond=cond, mask=mask)
        if pp is not None:
            return self.prior.log_prob(pp, zk, mask) + ldj
        return self.prior.log_prob(zk, mask) + ldj

    def sample(self, params, rng: jax.Array, shape, *, cond=None, mask=None,
               temperature: float = 1.0):
        _, pp = self._split(params)
        if pp is not None:
            zk = self.prior.sample(pp, rng, shape, temperature)
        else:
            zk = self.prior.sample(rng, shape, temperature)
        z0, _ = self.inverse(params, zk, cond=cond, mask=mask)
        return z0

    def data_init(self, params, z: Array, *, cond=None, mask=None):
        """Data-dependent init pass (SURVEY.md §3.4).

        Runs the stack once on a calibration batch; layers flagged
        ``has_data_init`` (actnorm) replace their params with statistics of
        the activations they see.  Runs un-jitted, before training.
        """
        lp, pp = self._split(params)
        new_params = []
        for layer, p in zip(self.layers, lp):
            if layer.has_data_init:
                p, z = layer.data_init(p, z, cond=cond, mask=mask)
            else:
                z, _ = layer.forward(p, z, jnp.zeros(z.shape[0], jnp.float32),
                                     cond=cond, mask=mask)
            new_params.append(p)
        if pp is not None:
            new_params.append(pp)
        return tuple(new_params)
