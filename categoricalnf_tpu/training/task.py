"""Task protocol — batch -> loss, eval loop, sampling hooks.

Reference parity: ``TaskTemplate`` in ``general/task.py`` (SURVEY.md C19).
A task owns its datasets and its ``CategoricalFlow`` model; the trainer only
sees this interface.  Batches are dicts of numpy/JAX arrays with keys
``x`` [B, T] int32 and optionally ``mask`` [B, T], ``cond`` [B, T, C].
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import numpy as np

from categoricalnf_tpu.models.categorical_flow import CategoricalFlow


class TaskTemplate:
    name: str = "task"
    model: CategoricalFlow

    # -- data -------------------------------------------------------------

    def train_batches(self, rng: np.random.Generator) -> Iterator[dict]:
        raise NotImplementedError

    def eval_batches(self) -> list[dict]:
        raise NotImplementedError

    # -- objective --------------------------------------------------------

    def loss(self, params, batch: dict, rng: jax.Array, beta) -> jax.Array:
        return self.model.loss_bpd(params, batch["x"], rng,
                                   mask=batch.get("mask"),
                                   cond=batch.get("cond"), beta=beta)

    def eval_step(self, params, batch: dict, rng: jax.Array,
                  num_samples: int) -> jax.Array:
        """Per-example IW bpd for one batch (jittable)."""
        return self.model.eval_bpd(params, batch["x"], rng,
                                   num_samples=num_samples,
                                   mask=batch.get("mask"),
                                   cond=batch.get("cond"))

    # -- hooks ------------------------------------------------------------

    def init_params(self, rng: jax.Array):
        return self.model.init(rng)

    def data_init(self, params, batch: dict, rng: jax.Array):
        return self.model.data_init(params, batch["x"], rng,
                                    mask=batch.get("mask"),
                                    cond=batch.get("cond"))

    def sample_metrics(self, params, rng: jax.Array) -> dict:
        """Task-specific sample-quality metrics (validity etc.)."""
        return {}

    def sample_artifacts(self, params, rng: jax.Array, out_dir: str) -> None:
        """Dump model samples to ``out_dir`` (reference parity: sampled
        text / SMILES files, SURVEY.md §5 observability).  Optional."""

    def test_batches(self) -> list[dict]:
        """Held-out test split; defaults to the validation batches."""
        return self.eval_batches()

    def analytic_optimum_bpd(self) -> Optional[float]:
        return None
