"""Task protocol — batch -> loss, eval loop, sampling hooks.

Reference parity: ``TaskTemplate`` in ``general/task.py`` (SURVEY.md C19).
A task owns its datasets and its ``CategoricalFlow`` model; the trainer only
sees this interface.  Batches are dicts of numpy/JAX arrays with keys
``x`` [B, T] int32 and optionally ``mask`` [B, T], ``cond`` [B, T, C].
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import numpy as np

from categoricalnf_tpu.models.categorical_flow import CategoricalFlow


def force_f32(obj):
    """Recursively rebuild a stateless model dataclass tree with every
    ``compute_dtype`` field set to float32 (params are unchanged — they
    are stored fp32; the field only controls apply-time casts)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        changes = {}
        for f in dataclasses.fields(obj):
            if not f.init:
                continue
            v = getattr(obj, f.name)
            if f.name == "compute_dtype":
                if v != "float32":
                    changes[f.name] = "float32"
            else:
                nv = force_f32(v)
                if nv is not v:  # identity only — v may be an array
                    changes[f.name] = nv
        return dataclasses.replace(obj, **changes) if changes else obj
    if isinstance(obj, tuple):
        new = tuple(force_f32(v) for v in obj)
        return new if any(a is not b for a, b in zip(new, obj)) else obj
    if isinstance(obj, list):
        return [force_f32(v) for v in obj]
    if isinstance(obj, dict):
        return {k: force_f32(v) for k, v in obj.items()}
    return obj


class TaskTemplate:
    name: str = "task"
    model: CategoricalFlow

    @property
    def eval_model(self):
        """fp32-compute twin of ``self.model`` for DENSITY evaluations.

        bf16 forward noise is ~zero-mean in log-space, but the IW bound
        exponentiates it: E[logsumexp(elbo + eps)] inflates by ~sigma^2/2
        (Jensen), so bf16-evaluated likelihood bounds are systematically
        OPTIMISTIC — measured +0.054 bits/char on runs/lm_v4 (TPU bf16
        in-run eval 3.6047 vs the same checkpoint/batches/seeds at 3.659
        on fp32 and bf16-emulating CPU).  The reference evaluates in fp32
        (PyTorch default), so parity numbers require fp32 evals; training
        stays bf16 (the loss gradient doesn't carry the exp bias).
        """
        m = getattr(self, "_eval_model_cache", None)
        if m is None:
            m = force_f32(self.model)
            self._eval_model_cache = m
        return m

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
        """Per-example IW bpd for one batch (jittable, fp32 compute —
        see ``eval_model``)."""
        return self.eval_model.eval_bpd(params, batch["x"], rng,
                                        num_samples=num_samples,
                                        mask=batch.get("mask"),
                                        cond=batch.get("cond"))

    # The three hooks below expose the pieces of ``eval_step`` separately
    # so the trainer can shard IS chains over the mesh's ``sample`` axis
    # (parallel/eval.make_task_sharded_iw_eval): per-chain ELBOs are
    # computed per device and the logsumexp over chains runs as an XLA
    # collective.  ``eval_step`` must equal
    # ``-logsumexp_S(elbo)/ (num_vars * ln2) + eval_bpd_extra``.

    def elbo(self, params, batch: dict, rng: jax.Array) -> jax.Array:
        """Single-sample per-example ELBO [B] (jittable, fp32 compute)."""
        return self.eval_model.elbo(params, batch["x"], rng,
                                    mask=batch.get("mask"),
                                    cond=batch.get("cond"))["elbo"]

    def num_vars(self, batch: dict) -> jax.Array:
        """Per-example count of categorical variables [B] (jittable)."""
        import jax.numpy as jnp
        x, mask = batch["x"], batch.get("mask")
        if mask is None:
            return jnp.full((x.shape[0],), float(x.shape[1]), jnp.float32)
        return jnp.asarray(mask, jnp.float32).sum(axis=1)

    def eval_bpd_extra(self, batch: dict):
        """Additive per-example bpd term outside the IW bound (e.g. the
        molecule task's categorical node-count prior)."""
        return 0.0

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
