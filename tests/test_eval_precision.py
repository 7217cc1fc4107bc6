"""fp32 evaluation twin: density evals must not run in bf16.

bf16 forward noise is ~zero-mean in log-space but the IW bound
exponentiates it, inflating E[logsumexp] by ~sigma^2/2 — measured +0.054
bits/char on runs/lm_v4 (see training/task.py:TaskTemplate.eval_model).
These tests pin the twin mechanics: every compute_dtype in the twin is
float32, params are shared unchanged, and a bf16 task's eval equals the
same architecture built fp32 from scratch.
"""

import dataclasses

import jax
import numpy as np

from categoricalnf_tpu.tasks import SetShufflingTask
from categoricalnf_tpu.tasks.molecules import MoleculeTask
from categoricalnf_tpu.training.task import force_f32


def _dtype_fields(obj, acc):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if f.name == "compute_dtype":
                acc.append(v)
            else:
                _dtype_fields(v, acc)
    elif isinstance(obj, (tuple, list)):
        for v in obj:
            _dtype_fields(v, acc)
    elif isinstance(obj, dict):
        for v in obj.values():
            _dtype_fields(v, acc)
    return acc


def _task(dtype):
    return SetShufflingTask(set_size=8, batch_size=64, encoding_dim=2,
                            num_layers=2, hidden_dim=32, num_mixtures=4,
                            eval_batches_count=1, compute_dtype=dtype)


def test_force_f32_rewrites_every_dtype_field():
    task = _task("bfloat16")
    assert "bfloat16" in _dtype_fields(task.model, [])
    twin = force_f32(task.model)
    dts = _dtype_fields(twin, [])
    assert dts and all(d == "float32" for d in dts)


def test_eval_model_identity_when_already_f32():
    task = _task("float32")
    assert task.eval_model is task.model


def test_bf16_task_eval_equals_f32_built_task(rng):
    bf16 = _task("bfloat16")
    f32 = _task("float32")
    params = bf16.init_params(rng)  # same seed -> same fp32 params
    batch = {"x": next(bf16.train_batches(np.random.default_rng(0)))["x"]}
    a = np.asarray(bf16.eval_step(params, batch, rng, num_samples=4))
    b = np.asarray(f32.eval_step(params, batch, rng, num_samples=4))
    assert np.allclose(a, b, atol=1e-5), (a[:3], b[:3])
    # and the bf16 twin really is a different density than fp32 training
    # only through the LOSS path, not the eval path:
    assert np.all(np.isfinite(a))


def test_graphcnf_eval_model_builds():
    task = MoleculeTask(dataset="synthetic", synth_size=64, max_nodes=8,
                        batch_size=16, hidden_dim=16, num_layers_node=1,
                        num_layers_edge=1, num_mixtures=4,
                        compute_dtype="bfloat16", eval_batches_count=1)
    dts = _dtype_fields(task.eval_model, [])
    assert dts and all(d == "float32" for d in dts)
