"""Training engine integration tests (SURVEY.md §4.5): a short set-shuffling
run must make real progress toward the analytic optimum."""

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu.tasks import SetShufflingTask
from categoricalnf_tpu.training import (OptimizerConfig, ScheduleSpec,
                                        TrainConfig, Trainer)


def _tiny_task(**kw):
    defaults = dict(set_size=8, batch_size=256, encoding_dim=2,
                    num_layers=3, hidden_dim=48, num_mixtures=4,
                    eval_batches_count=1)
    defaults.update(kw)
    return SetShufflingTask(**defaults)


def test_set_shuffling_short_training_progress(tmp_path):
    task = _tiny_task()
    cfg = TrainConfig(
        num_steps=120, eval_every=120, eval_samples=4, log_every=60,
        out_dir=str(tmp_path / "run"),
        optimizer=OptimizerConfig(learning_rate=2e-3),
        beta_schedule=ScheduleSpec(kind="constant", value=1.0))
    trainer = Trainer(task, cfg)

    # initial loss for comparison
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)
    batch0 = {"x": jnp.asarray(next(task.train_batches(np_rng))["x"])}
    params0 = task.init_params(rng)
    loss0 = float(task.loss(params0, batch0, rng, 1.0))

    final = trainer.train(resume=False)
    opt = task.analytic_optimum_bpd()
    assert np.isfinite(final["best_bpd"])
    # must beat the untrained model clearly and be above the optimum
    assert final["best_bpd"] < loss0 - 0.2, (final, loss0)
    assert final["best_bpd"] > opt - 0.05


def test_steps_per_call_matches_single_step():
    """Multi-step training (K optimizer steps per device call via
    lax.scan) must reproduce the K=1 step arithmetic exactly: per-step
    rng folds on state.step, β on the step index, optimizer state chains.
    Constant batches remove data-stream alignment from the comparison.
    Also exercises the misaligned remainder path (num_steps % K != 0)."""
    import itertools

    fixed = None

    def make_trainer(steps_per_call, num_steps):
        nonlocal fixed
        task = _tiny_task(batch_size=64, compute_dtype="float32")
        if fixed is None:
            fixed = next(task.train_batches(np.random.default_rng(3)))
        task.train_batches = lambda rng_np: itertools.repeat(fixed)
        cfg = TrainConfig(num_steps=num_steps, eval_every=num_steps,
                          eval_samples=1, log_every=4, out_dir=None,
                          run_test=False, steps_per_call=steps_per_call,
                          beta_schedule=ScheduleSpec(kind="sigmoid",
                                                     start=0.5, end=1.0,
                                                     center=5, rate=0.2))
        return Trainer(task, cfg)

    for num_steps in (8, 10):  # aligned and remainder-bearing
        tr1 = make_trainer(1, num_steps)
        tr1.train(resume=False)
        tr4 = make_trainer(4, num_steps)
        tr4.train(resume=False)
        assert int(tr1._final_state.step) == num_steps
        assert int(tr4._final_state.step) == num_steps
        for a, b in zip(jax.tree.leaves(tr1._final_state.params),
                        jax.tree.leaves(tr4._final_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_steps_per_call_oom_fallback():
    """A RESOURCE_EXHAUSTED from the K-step scan's first call must degrade
    to single-step execution (same data, same final step count) instead of
    killing the run at compile time (VERDICT r4 #9; lm_v6 K=4 OOM)."""
    import itertools

    task = _tiny_task(batch_size=64, compute_dtype="float32")
    fixed = next(task.train_batches(np.random.default_rng(3)))
    task.train_batches = lambda rng_np: itertools.repeat(fixed)
    cfg = TrainConfig(num_steps=8, eval_every=8, eval_samples=1,
                      log_every=4, out_dir=None, run_test=False,
                      steps_per_call=4)
    tr = Trainer(task, cfg)

    calls = {"n": 0}

    def oom_multi_step(state, batches, base_rng):
        calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory (simulated)")

    tr._multi_step = oom_multi_step
    final = tr.train(resume=False)
    assert calls["n"] == 1, "fallback must stop retrying the scan"
    assert int(tr._final_state.step) == 8
    assert np.isfinite(final["best_bpd"])


def test_checkpoint_resume(tmp_path):
    task = _tiny_task()
    out = str(tmp_path / "run")
    cfg = TrainConfig(num_steps=10, eval_every=5, eval_samples=1,
                      log_every=100, out_dir=out)
    t1 = Trainer(task, cfg)
    t1.train(resume=False)

    cfg2 = TrainConfig(num_steps=12, eval_every=100, eval_samples=1,
                       log_every=100, out_dir=out)
    t2 = Trainer(task, cfg2)
    t2.train(resume=True)  # must pick up from the saved step without error
    assert int(t2._final_state.step) == 12


def test_resume_reseeds_best_from_reeval(tmp_path):
    """A stale (too-low) saved metrics record must not block
    best-checkpoint updates after resume: best_bpd is RE-EVALUATED from
    the best checkpoint's params under the CURRENT eval definition (the
    fp32-eval-twin correction changed eval numbers between sessions)."""
    import glob
    import json
    import os

    task = _tiny_task()
    out = str(tmp_path / "run")
    cfg = TrainConfig(num_steps=10, eval_every=5, eval_samples=1,
                      log_every=100, out_dir=out)
    Trainer(task, cfg).train(resume=False)
    # poison the saved best metrics with an unbeatable bpd
    for mp in glob.glob(os.path.join(out, "checkpoints", "*",
                                     "metrics.json")):
        with open(mp, "w") as f:
            json.dump({"bpd": 1e-6}, f)
    steps_before = {os.path.basename(p) for p in
                    glob.glob(os.path.join(out, "checkpoints", "step_*"))}
    cfg2 = TrainConfig(num_steps=20, eval_every=5, eval_samples=1,
                       log_every=100, out_dir=out)
    Trainer(task, cfg2).train(resume=True)
    steps_after = {os.path.basename(p) for p in
                   glob.glob(os.path.join(out, "checkpoints", "step_*"))}
    # the resumed run keeps training and must be ABLE to save a new best
    # (with the stale 1e-6 seed it never could; with re-eval it does as
    # soon as an eval improves on the true restored-params bpd)
    assert steps_after - steps_before, (steps_before, steps_after)


def test_trainer_test_split_eval(tmp_path):
    task = _tiny_task()
    cfg = TrainConfig(num_steps=5, eval_every=5, eval_samples=1,
                      final_eval_samples=4, log_every=100,
                      out_dir=str(tmp_path / "run"))
    tr = Trainer(task, cfg)
    tr.train(resume=False)
    res = tr.test(tr._final_state.params)
    assert np.isfinite(res["test_bpd"]) and res["test_bpd"] > 0
    assert res["num_importance_samples"] == 4
    assert "test_gap_to_optimum" in res


def test_beta_schedule_values():
    s = ScheduleSpec(kind="sigmoid", start=0.0, end=1.0, center=100,
                     rate=0.1).build()
    assert float(s(0)) < 0.01
    assert abs(float(s(100)) - 0.5) < 1e-5
    assert float(s(1000)) > 0.99
    e = ScheduleSpec(kind="exponential", value=1e-3, decay_rate=0.5,
                     decay_steps=100).build()
    assert abs(float(e(100)) - 5e-4) < 1e-9


def test_logged_steps_per_s_matches_wall_clock(tmp_path):
    """The logged steps_per_s must agree with the metrics rows' own
    time-field deltas.  Round-3 archaeology: pre-`db04cad` runs logged
    DISPATCH rates up to 16x the wall-clock truth (runs/set16's 394-568
    steps/s vs a sustained 35.3); the engine now forces metric reads
    before reading the clock, and this pins that contract."""
    import json
    task = _tiny_task()
    out = tmp_path / "run"
    cfg = TrainConfig(
        num_steps=300, eval_every=300, eval_samples=2, log_every=50,
        out_dir=str(out),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        beta_schedule=ScheduleSpec(kind="constant", value=1.0))
    Trainer(task, cfg).train(resume=False)
    rows = [json.loads(l) for l in open(out / "metrics.jsonl")]
    train = [r for r in rows if r.get("prefix") == "train"
             and "steps_per_s" in r]
    assert len(train) >= 4
    # skip the first window (includes compile); compare each subsequent
    # logged rate against the wall rate from the rows' own timestamps
    for a, b in zip(train[1:], train[2:]):
        wall = (b["step"] - a["step"]) / max(b["time"] - a["time"], 1e-9)
        logged = b["steps_per_s"]
        assert 0.5 * wall <= logged <= 2.0 * wall, (
            f"logged {logged:.1f} vs wall {wall:.1f} steps/s — "
            "dispatch-rate artifact is back")
