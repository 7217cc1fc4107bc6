"""Inference API: train a tiny run, reload it, sample + evaluate."""

import jax
import numpy as np

from categoricalnf_tpu.inference import load_run
from categoricalnf_tpu.tasks import SetShufflingTask
from categoricalnf_tpu.training import TrainConfig, Trainer
from categoricalnf_tpu.utils.config import save_config


def test_load_run_roundtrip(tmp_path, rng):
    out = str(tmp_path / "run")
    task = SetShufflingTask(set_size=8, batch_size=128, encoding_dim=2,
                            num_layers=3, hidden_dim=48, num_mixtures=4,
                            eval_batches_count=1)
    cfg = TrainConfig(num_steps=8, eval_every=8, eval_samples=1,
                      log_every=100, out_dir=out)
    save_config(out, {"task": "set_shuffling",
                      "args": {"set_size": 8, "batch_size": 128,
                               "encoding_dim": 2, "num_layers": 3,
                               "hidden_dim": 48, "num_mixtures": 4,
                               "compute_dtype": "float32"}})
    Trainer(task, cfg).train(resume=False)

    handle = load_run(out)
    assert handle.step == 8
    x = handle.sample(rng, batch=4, num_pos=8)
    assert np.asarray(x).shape == (4, 8)
    batch = {"x": np.asarray(next(task.train_batches(
        np.random.default_rng(0)))["x"])}
    bpd = handle.eval_bpd(batch, rng, num_samples=2)
    assert np.all(np.isfinite(bpd))
