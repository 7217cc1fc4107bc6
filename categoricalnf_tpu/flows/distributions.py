"""Factorized base/prior distributions for the top of the flow.

Reference parity: ``LogisticDistribution`` / ``create_prior_distribution``
in ``layers/flows/distributions.py`` (SURVEY.md C8/C9).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from categoricalnf_tpu.flows.base import sum_ldj
from categoricalnf_tpu.ops import numerics as nm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LogisticPrior:
    """Standard factorized logistic prior."""

    def log_prob(self, z: Array, mask: Optional[Array] = None) -> Array:
        per = nm.logistic_log_pdf(z, 0.0, 0.0)
        return sum_ldj(per, mask)

    def sample(self, rng: jax.Array, shape,
               temperature: float = 1.0) -> Array:
        """Draw from the prior; ``temperature`` scales the base logistic
        (T<1 concentrates mass near the mode — the standard flow-sampling
        knob for the validity/diversity trade-off)."""
        return nm.logistic_sample(rng, shape) * temperature


@dataclasses.dataclass(frozen=True)
class GaussianPrior:
    """Standard factorized normal prior."""

    def log_prob(self, z: Array, mask: Optional[Array] = None) -> Array:
        z32 = jnp.asarray(z, jnp.float32)
        per = -0.5 * (z32 ** 2 + jnp.log(2.0 * jnp.pi))
        return sum_ldj(per, mask)

    def sample(self, rng: jax.Array, shape,
               temperature: float = 1.0) -> Array:
        return jax.random.normal(rng, shape, dtype=jnp.float32) * temperature


def create_prior(name: str):
    if name in ("logistic", "logistic_mixture", None):
        return LogisticPrior()
    if name in ("gaussian", "normal"):
        return GaussianPrior()
    raise ValueError(f"unknown prior {name!r}")
