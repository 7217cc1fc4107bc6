"""Orbax checkpointing with best-metric retention + resume.

Reference parity: ``torch.save`` best-checkpoint logic + ``--restart``
resume in ``general/train.py`` (SURVEY.md §5 checkpoint/resume).  Saves the
train-state PyTree (params, optimizer state, step) and the eval metrics
that earned the save.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, out_dir: str, keep: int = 2,
                 subdir: str = "checkpoints"):
        self.dir = os.path.abspath(os.path.join(out_dir, subdir))
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.keep = keep

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"step_{step:08d}")

    def save(self, step: int, state, metrics: Optional[dict] = None):
        payload = {
            "step": np.asarray(step, np.int32),
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
        }
        path = self._path(step)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        if metrics:
            with open(os.path.join(path, "metrics.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)
        self._gc()

    def _steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("step_"):
                out.append(int(name.split("_")[1]))
        return sorted(out)

    def _gc(self):
        steps = self._steps()
        for s in steps[:-self.keep]:
            import shutil
            shutil.rmtree(self._path(s), ignore_errors=True)

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def latest_metrics(self) -> Optional[dict]:
        """Eval metrics recorded with the newest checkpoint (used to seed
        ``best_bpd`` on resume so a post-resume eval cannot displace the
        historical best; ADVICE r1 medium)."""
        steps = self._steps()
        if not steps:
            return None
        path = os.path.join(self._path(steps[-1]), "metrics.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def restore_latest(self, target: Optional[dict] = None) -> Optional[dict]:
        """Restore the newest checkpoint.

        ``target`` must be a matching PyTree (e.g. a freshly-initialised
        payload) so typed containers (optax states, namedtuples) are
        reconstructed instead of raw dicts.
        """
        steps = self._steps()
        if not steps:
            return None
        path = self._path(steps[-1])
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return self._ckptr.restore(path, abstract)
        return self._ckptr.restore(path)
