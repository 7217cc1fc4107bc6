"""Inference API: load a finished run and serve samples / likelihoods.

Reference parity: the reference reconstructs models from the dumped
args-json for eval/sampling (SURVEY.md §3.5); here ``load_run`` rebuilds
the task from the run's ``config.json``, restores the best Orbax
checkpoint, and returns a handle with jit-compiled ``sample`` /
``eval_bpd`` entry points.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

from categoricalnf_tpu.training.checkpoint import CheckpointManager
from categoricalnf_tpu.utils.config import load_config


def build_task(task_name: str, args: dict):
    """Rebuild a task object from CLI args saved in config.json."""
    common = dict(
        batch_size=args.get("batch_size", 128),
        hidden_dim=args.get("hidden_dim", 96),
        num_mixtures=args.get("num_mixtures", 8),
        compute_dtype=args.get("compute_dtype", "bfloat16"),
    )
    if task_name == "set_shuffling":
        from categoricalnf_tpu.tasks import SetShufflingTask
        return SetShufflingTask(
            set_size=args.get("set_size", 16),
            encoding_name=args.get("encoding", "mixture"),
            encoding_dim=args.get("encoding_dim", 4),
            num_layers=args.get("num_layers", 8), **common)
    if task_name == "set_summation":
        from categoricalnf_tpu.tasks import SetSummationTask
        return SetSummationTask(
            set_size=args.get("set_size", 16),
            num_categories=args.get("num_categories", 10),
            target_sum=args.get("target_sum", 0),
            encoding_name=args.get("encoding", "mixture"),
            encoding_dim=args.get("encoding_dim", 4),
            num_layers=args.get("num_layers", 8), **common)
    if task_name.startswith("lm_"):
        from categoricalnf_tpu.tasks import LanguageModelingTask
        return LanguageModelingTask(
            corpus_name=args.get("corpus", "synthetic"),
            data_dir=args.get("data_dir"),
            seq_len=args.get("seq_len", 256),
            encoding_name=args.get("encoding", "mixture"),
            encoding_dim=args.get("encoding_dim", 3),
            num_layers=args.get("num_layers", 2),
            lstm_layers=args.get("lstm_layers", 2), **common)
    if task_name == "graph_coloring":
        from categoricalnf_tpu.tasks.graph_coloring import GraphColoringTask
        return GraphColoringTask(
            min_nodes=args.get("min_nodes", 10),
            max_nodes=args.get("max_nodes", 20),
            num_colors=args.get("num_colors", 3),
            edge_prob=args.get("edge_prob", 0.25),
            encoding_dim=args.get("encoding_dim", 2),
            num_layers=args.get("num_layers", 6), **common)
    if task_name.startswith("molecules_"):
        from categoricalnf_tpu.tasks.molecules import MoleculeTask
        return MoleculeTask(
            dataset=args.get("dataset", "zinc250k"),
            data_dir=args.get("data_dir"),
            max_nodes=args.get("max_nodes", 38),
            num_layers_node=args.get("num_layers_node", 4),
            num_layers_edge=args.get("num_layers_edge", 4), **common)
    raise ValueError(f"unknown task {task_name!r}")


@dataclasses.dataclass
class RunHandle:
    task: Any
    params: Any
    step: int

    def sample(self, rng: jax.Array, batch: int, **kw):
        return self.task.model.sample(self.params, rng, batch, **kw)

    def eval_bpd(self, batch: dict, rng: jax.Array,
                 num_samples: int = 16) -> np.ndarray:
        return np.asarray(
            self.task.eval_step(self.params, batch, rng, num_samples))

    def sample_metrics(self, rng: jax.Array) -> dict:
        return self.task.sample_metrics(self.params, rng)


def load_run(run_dir: str) -> RunHandle:
    cfg = load_config(run_dir)
    if cfg is None:
        raise FileNotFoundError(f"no config.json in {run_dir}")
    task = build_task(cfg["task"], cfg.get("args", {}))
    # Raw restore (no target tree): inference only needs the params, and
    # our param PyTrees are plain dicts/lists, which round-trip as-is.
    ckpt = CheckpointManager(run_dir)
    restored = ckpt.restore_latest()
    if restored is None:
        raise FileNotFoundError(f"no checkpoints in {run_dir}")
    return RunHandle(task=task, params=restored["params"],
                     step=int(restored["step"]))
