"""Trainer must handle batches with nested cond PyTrees (graph tasks)."""

import numpy as np

from categoricalnf_tpu.tasks.graph_coloring import GraphColoringTask
from categoricalnf_tpu.training import TrainConfig, Trainer


def test_trainer_with_graph_cond_batches():
    task = GraphColoringTask(min_nodes=5, max_nodes=8, batch_size=16,
                             encoding_dim=2, num_layers=2, hidden_dim=24,
                             num_mixtures=3, eval_batches_count=1)
    cfg = TrainConfig(num_steps=3, eval_every=3, eval_samples=1,
                      log_every=10, out_dir=None)
    final = Trainer(task, cfg).train(resume=False)
    assert np.isfinite(final["best_bpd"])
