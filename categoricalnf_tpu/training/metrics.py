"""Metrics sinks: JSONL file + stdout + optional TensorBoard.

Reference parity: the TensorBoard ``SummaryWriter`` scalars in
``general/train.py`` (SURVEY.md §5).  JSONL is the primary machine-readable
stream (required for the bench harness); TensorBoard via ``tensorboardX``
is attached when available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, out_dir: Optional[str] = None,
                 use_tensorboard: bool = True, quiet: bool = False):
        self.out_dir = out_dir
        self.quiet = quiet
        self._jsonl = None
        self._tb = None
        self._t0 = time.time()
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from tensorboardX import SummaryWriter
                    self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
                except Exception:
                    self._tb = None

    def log(self, step: int, scalars: dict, prefix: str = "train"):
        rec = {"step": int(step), "time": time.time() - self._t0,
               "prefix": prefix}
        rec.update({k: float(v) for k, v in scalars.items()})
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)
        if not self.quiet:
            parts = " ".join(f"{k}={float(v):.4f}" for k, v in scalars.items())
            print(f"[{prefix} @ {step}] {parts}", flush=True)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
