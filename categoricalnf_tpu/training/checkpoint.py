"""Orbax checkpointing with best-metric retention + resume.

Reference parity: ``torch.save`` best-checkpoint logic + ``--restart``
resume in ``general/train.py`` (SURVEY.md §5 checkpoint/resume).  Saves the
train-state PyTree (params, optimizer state, step) and the eval metrics
that earned the save.
"""

from __future__ import annotations

import json
import os
import re
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

    # Only COMPLETE checkpoints: an interrupted orbax save (KILL mid-save
    # under `timeout -k`) leaves a "step_XXXXXXXX.orbax-checkpoint-tmp-*"
    # dir whose name would crash int() and permanently break resume
    # (ADVICE r2 medium).
    _STEP_RE = re.compile(r"^step_(\d{8})$")

    def _steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            m = self._STEP_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _gc(self):
        import shutil
        steps = self._steps()
        for s in steps[:-self.keep]:
            shutil.rmtree(self._path(s), ignore_errors=True)
        # Sweep orphaned tmp dirs from interrupted saves so they don't
        # accumulate (and don't get stashed across windows).
        for name in os.listdir(self.dir):
            if "orbax-checkpoint-tmp" in name:
                shutil.rmtree(os.path.join(self.dir, name),
                              ignore_errors=True)

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
