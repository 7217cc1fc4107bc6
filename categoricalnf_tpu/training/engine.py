"""Training engine: jitted sharded train/eval steps + host loop.

Reference parity: ``TrainTemplate.train_model`` in ``general/train.py``
(SURVEY.md C18): loop, grad clip, RAdam, LR/β schedules, periodic IS eval,
best-checkpoint tracking, metrics, resume.  TPU-native differences:

  - ONE jitted ``train_step`` (loss + grad + optimizer update) with donated
    state; params replicated, batch sharded over the mesh's ``data`` axis —
    XLA inserts the ICI psum for the gradient reduction (no hand-written
    comm; SURVEY.md §5 "distributed comm backend").
  - data-dependent actnorm init runs once, un-jitted, on a replicated
    calibration batch before step 0 (SURVEY.md §3.4 / hard part 4).
  - evaluation is a jitted IW-bound step; chains can additionally shard
    over the ``sample`` axis (parallel/mesh.py).
  - checkpoint/resume via Orbax with best-metric retention.
"""

from __future__ import annotations

import dataclasses
import signal
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from categoricalnf_tpu.parallel import mesh as mesh_lib
from categoricalnf_tpu.training import checkpoint as ckpt_lib
from categoricalnf_tpu.training.metrics import MetricsLogger
from categoricalnf_tpu.training.schedules import ScheduleSpec
from categoricalnf_tpu.training.state import OptimizerConfig, TrainState
from categoricalnf_tpu.training.task import TaskTemplate


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_steps: int = 10_000
    eval_every: int = 1_000
    eval_samples: int = 8
    final_eval_samples: int = 32
    seed: int = 42
    optimizer: OptimizerConfig = OptimizerConfig()
    beta_schedule: ScheduleSpec = ScheduleSpec(
        kind="sigmoid", start=0.5, end=1.0, center=2000, rate=0.002)
    out_dir: Optional[str] = None
    log_every: int = 100
    keep_checkpoints: int = 2
    # Periodic ("last") checkpoints alongside the best-metric ones so a
    # crash during a plateau loses at most this many steps (VERDICT r1
    # weak #6).  0 -> use eval_every.
    checkpoint_every: int = 0
    # Run the large-IS test-split evaluation at the end of train() and log
    # it as test_bpd (reference test() discipline, SURVEY.md §3.2).
    run_test: bool = True
    # Tracing/profiling (SURVEY.md §5): when set, a jax.profiler trace of
    # steps [profile_start, profile_start+profile_steps) is written here
    # (viewable with tensorboard-plugin-profile).
    profile_dir: Optional[str] = None
    profile_start: int = 10
    profile_steps: int = 5
    # Multi-step training: run K optimizer steps per device call as a
    # lax.scan over a [K, B, ...] batch stack.  Amortizes the per-dispatch
    # host<->device round-trip (significant through the TPU tunnel: the
    # flagship step is ~2 ms of compute) and lets XLA overlap step
    # boundaries.  The rng/β/step arithmetic is bit-identical to K=1
    # (per-step rng folds on state.step INSIDE the scan); logging/eval/
    # checkpoint cadences fire on boundary CROSSINGS so they need not be
    # multiples of K.  Steps that don't fit a full K-chunk (resume from an
    # arbitrary preemption point, final remainder) run single-step.
    steps_per_call: int = 1


class Trainer:
    def __init__(self, task: TaskTemplate, config: TrainConfig,
                 mesh=None):
        self.task = task
        self.config = config
        self.mesh = mesh if mesh is not None else mesh_lib.create_mesh()
        self.tx = config.optimizer.build()
        self.beta_fn = config.beta_schedule.build()
        self.logger = MetricsLogger(config.out_dir)
        self._build_steps()

    # -- jitted steps -----------------------------------------------------

    def _build_steps(self):
        task, tx, beta_fn = self.task, self.tx, self.beta_fn
        repl = mesh_lib.replicated(self.mesh)
        data_sh = mesh_lib.batch_sharding(self.mesh)

        def train_step(state: TrainState, batch, base_rng):
            beta = beta_fn(state.step)
            # Per-step rng derived INSIDE the jitted step from state.step:
            # no eager fold_in dispatch on the host per iteration (each
            # eager op is a tunnel round-trip), and resume reproduces the
            # same stream since state.step is checkpointed.
            rng = jax.random.fold_in(base_rng, state.step)

            def loss_fn(params):
                return task.loss(params, batch, rng, beta)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state)
            return new_state, {"loss": loss, "grad_norm": gnorm,
                               "beta": beta}

        def eval_step(params, batch, rng, num_samples):
            return task.eval_step(params, batch, rng, num_samples)

        del data_sh  # batches arrive pre-sharded via shard_batch()
        self._replicated = repl
        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        if self.config.steps_per_call > 1:
            def multi_step(state, batches, base_rng):
                def body(st, b):
                    return train_step(st, b, base_rng)

                state, ms = jax.lax.scan(body, state, batches)
                # report the LAST microstep's metrics (what a K=1 loop
                # would have had in hand at the same step count)
                return state, jax.tree.map(lambda a: a[-1], ms)

            self._multi_step = jax.jit(multi_step, donate_argnums=(0,))
        else:
            self._multi_step = None
        self._eval_step = jax.jit(eval_step, static_argnums=(3,))
        # When the mesh has a nontrivial 'sample' axis, IS chains shard
        # over it (VERDICT r1 #8); otherwise plain jit.
        if self.mesh.shape[mesh_lib.SAMPLE_AXIS] > 1:
            from categoricalnf_tpu.parallel.eval import (
                make_task_sharded_iw_eval)
            self._sharded_eval = make_task_sharded_iw_eval(task, self.mesh)
        else:
            self._sharded_eval = None

    # -- loop -------------------------------------------------------------

    def train(self, resume: bool = True) -> dict:
        cfg = self.config
        rng = jax.random.PRNGKey(cfg.seed)
        np_rng = np.random.default_rng(cfg.seed)
        from categoricalnf_tpu.data.prefetch import Prefetcher
        K = max(1, int(cfg.steps_per_call))
        # _shard runs in the worker thread: H2D transfer overlaps compute.
        if K > 1:
            def grouped(it):
                while True:
                    items = [next(it) for _ in range(K)]
                    yield jax.tree.map(lambda *xs: np.stack(xs), *items)

            data_iter = Prefetcher(grouped(self.task.train_batches(np_rng)),
                                   transform=self._shard_stacked)
        else:
            data_iter = Prefetcher(self.task.train_batches(np_rng),
                                   transform=self._shard)

        start_step = 0
        ckpt = (ckpt_lib.CheckpointManager(cfg.out_dir, cfg.keep_checkpoints)
                if cfg.out_dir else None)
        # Periodic "last" checkpoints in a sibling dir: resume prefers the
        # newest of (best, last); inference serves the best dir.
        ckpt_last = (ckpt_lib.CheckpointManager(
            cfg.out_dir, keep=1, subdir="checkpoints_last")
            if cfg.out_dir else None)
        restore_src = None
        if resume and ckpt is not None:
            cands = [c for c in (ckpt, ckpt_last)
                     if c.latest_step() is not None]
            if cands:
                restore_src = max(cands, key=lambda c: c.latest_step())
        params = self.task.init_params(rng)
        if restore_src is None:
            # data-dependent actnorm init (SURVEY.md §3.4) — skipped when a
            # checkpoint will overwrite the params anyway (it costs a full
            # eager calibration pass on the device).
            calib = next(data_iter)  # already sharded by the prefetcher
            if K > 1:  # stacked [K, B, ...] — calibrate on the first slice
                calib = jax.tree.map(lambda a: a[0], calib)
            params = self.task.data_init(
                params, calib, jax.random.fold_in(rng, 999))
        state = TrainState.create(params, self.tx)

        best_bpd = float("inf")
        if restore_src is not None:
            target = {"step": np.zeros((), np.int32),
                      "params": jax.device_get(state.params),
                      "opt_state": jax.device_get(state.opt_state)}
            restored = restore_src.restore_latest(target)
            if restored is not None:
                state = TrainState(
                    step=jnp.asarray(restored["step"], jnp.int32),
                    params=restored["params"],
                    opt_state=restored["opt_state"])
                start_step = int(restored["step"])
                # Seed best_bpd so the first post-resume eval can't
                # displace the historical best (ADVICE r1 medium) — but
                # RE-EVALUATE the best checkpoint's params under the
                # CURRENT eval instead of trusting its saved metrics:
                # eval definitions change between sessions (e.g. the
                # fp32 eval twin replacing TPU-bf16-inflated bounds),
                # and a stale too-low number would silently block every
                # best-checkpoint update for the whole resumed run.
                best_restored = ckpt.restore_latest()
                if best_restored is not None:
                    bp = jax.device_put(best_restored["params"],
                                        self._replicated)
                    best_bpd = self.evaluate(
                        bp, num_samples=cfg.eval_samples,
                        rng=jax.random.fold_in(rng, 2**30 - 1))["bpd"]
                print(f"resumed from step {start_step} "
                      f"(best_bpd {best_bpd:.4f}, re-evaluated)",
                      flush=True)
        # Replicate the full train state across the mesh explicitly.
        state = jax.device_put(state, self._replicated)

        self._best_params_host = None
        # Graceful preemption (SIGTERM = what `timeout`, the campaign
        # controllers, and real TPU-VM preemptions deliver): stop the loop
        # at the next step boundary, save a resumable last-checkpoint, and
        # run the FULL final phase (best-params sample metrics + test
        # eval) — previously a timed-out run died mid-step and lost its
        # final metrics to the post-hoc CLIs.  Handler installation only
        # works in the main thread; elsewhere we skip it (tests that run
        # train() in a thread keep the default behavior).
        self._stop_requested = False
        prev_handler = None
        if threading.current_thread() is threading.main_thread():
            def _on_sigterm(signum, frame):
                self._stop_requested = True
                print("SIGTERM: finishing current step, then final eval",
                      flush=True)
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        end_step = start_step
        try:
            return self._train_loop(cfg, rng, data_iter, state, ckpt,
                                    ckpt_last, best_bpd, start_step)
        finally:
            # The handler stays installed through the ENTIRE final phase
            # (preemption save + sample metrics + test eval): preemption
            # managers commonly re-signal, and a second SIGTERM must not
            # kill the run mid-save with no final row (ADVICE r2 low).
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _train_loop(self, cfg, rng, data_iter, state, ckpt, ckpt_last,
                    best_bpd, start_step) -> dict:
        ckpt_every = cfg.checkpoint_every or cfg.eval_every
        K = max(1, int(cfg.steps_per_call))
        single_iter = None
        if K > 1:
            # On-demand single-batch source for steps that don't fit a
            # full K-chunk (remainder at num_steps; misaligned resume).
            # Fresh stream: the stacked prefetcher owns the main np_rng.
            src = self.task.train_batches(np.random.default_rng(
                cfg.seed + 17))
            single_iter = (self._shard(b) for b in src)
        t_last = time.time()
        steps_since = 0
        end_step = start_step
        prof_on = False
        step = start_step
        # Automatic steps_per_call fallback (VERDICT r4 #9): the K-step
        # scan holds K batches + scan-carried activations and can OOM at
        # compile on big-activation configs that run fine single-step
        # (lm_v6 K=4).  On a RESOURCE_EXHAUSTED from the FIRST multi-step
        # call, degrade to running the K slices of each stacked batch as
        # single steps — same data stream, same step count, logged loudly —
        # instead of killing the campaign at compile time.
        use_multi = self._multi_step is not None
        first_multi = True
        while step < cfg.num_steps:
            if self._stop_requested:
                break
            if cfg.profile_dir and not prof_on and step >= cfg.profile_start:
                jax.profiler.start_trace(cfg.profile_dir)
                prof_on = True
            if K > 1 and step + K <= cfg.num_steps:
                stacked = next(data_iter)
                if use_multi:
                    if first_multi:
                        # Donated inputs may be invalidated by a failed
                        # dispatch; keep a host copy for exactly one call.
                        state_backup = jax.device_get(state)
                    try:
                        state, metrics = self._multi_step(state, stacked,
                                                          rng)
                    except Exception as e:  # noqa: BLE001 — filtered below
                        if (not first_multi
                                or "RESOURCE_EXHAUSTED" not in str(e)):
                            raise
                        print(f"steps_per_call={K} scan OOM'd at compile; "
                              "falling back to single-step execution "
                              f"({type(e).__name__})", flush=True)
                        use_multi = False
                        state = jax.device_put(state_backup,
                                               self._replicated)
                    first_multi = False
                if not use_multi:
                    for j in range(K):
                        state, metrics = self._train_step(
                            state,
                            jax.tree.map(lambda a, j=j: a[j], stacked),
                            rng)
                k = K
            else:
                state, metrics = self._train_step(
                    state, next(single_iter if single_iter is not None
                                else data_iter), rng)
                k = 1
            prev, step = step, step + k
            end_step = step
            steps_since += k
            if (prof_on and cfg.profile_dir
                    and step >= cfg.profile_start + cfg.profile_steps):
                jax.tree.map(lambda a: a.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                prof_on = False
                cfg = dataclasses.replace(cfg, profile_dir=None)

            def crossed(every):  # cadence boundary inside (prev, step]
                return step // every > prev // every

            if crossed(cfg.log_every):
                # Force the metrics BEFORE reading the clock: dispatch is
                # async, so measuring dt first reports dispatch speed (the
                # python loop runs ~2000 steps ahead), not wall throughput
                # — the r1 "36M tokens/s" artifact.
                m = {k2: float(v) for k2, v in metrics.items()}
                dt = time.time() - t_last
                m["steps_per_s"] = steps_since / max(dt, 1e-9)
                self.logger.log(step, m, "train")
                t_last, steps_since = time.time(), 0

            if crossed(cfg.eval_every) or step == cfg.num_steps:
                is_final = step == cfg.num_steps
                eval_metrics = self.evaluate(
                    state.params,
                    num_samples=(cfg.final_eval_samples if is_final
                                 else cfg.eval_samples),
                    rng=jax.random.fold_in(rng, 2**30 + step - 1))
                self.logger.log(step, eval_metrics, "val")
                # An alarmed eval (impossible bpd) must never become the
                # "best" checkpoint inference will serve.
                if (eval_metrics["bpd"] < best_bpd
                        and not eval_metrics.get("integrity_alarm")):
                    best_bpd = eval_metrics["bpd"]
                    self._best_params_host = jax.device_get(state.params)
                    if ckpt is not None:
                        ckpt.save(int(state.step), state, eval_metrics)

            if ckpt_last is not None and (
                    crossed(ckpt_every) or step == cfg.num_steps):
                ckpt_last.save(int(state.step), state)

        if self._stop_requested and ckpt_last is not None:
            # Resumable from the exact preemption point.
            ckpt_last.save(int(state.step), state)

        # Final sample metrics come from the BEST params (the model the
        # best_bpd refers to), not the last step (ADVICE r1 low).
        best_params = self._best_params_host
        if best_params is None and ckpt is not None and ckpt.latest_step():
            best_params = ckpt.restore_latest()["params"]
        if best_params is None:
            best_params = state.params
        best_params = jax.device_put(best_params, self._replicated)

        final = {"best_bpd": best_bpd}
        if self._stop_requested:
            final["preempted"] = 1.0
        final.update(self.task.sample_metrics(
            best_params, jax.random.fold_in(rng, 777)))
        if cfg.out_dir:
            self.task.sample_artifacts(best_params,
                                       jax.random.fold_in(rng, 778),
                                       cfg.out_dir)
        if cfg.run_test:
            test_metrics = self.test(best_params)
            final.update(test_metrics)
            self.logger.log(end_step, test_metrics, "test")
        self.logger.log(end_step, final, "final")
        self._final_state = state
        self._best_params = best_params
        return final

    def test(self, params, num_samples: Optional[int] = None,
             seed: int = 7) -> dict:
        """Test-split evaluation with a large IS-sample count (reference
        parity: ``TaskTemplate.test()``, SURVEY.md §3.2)."""
        num_samples = num_samples or self.config.final_eval_samples
        rng = jax.random.PRNGKey(seed)
        bpds = []
        for i, batch in enumerate(self.task.test_batches()):
            bpd = self._eval_batch(params, batch,
                                   jax.random.fold_in(rng, i), num_samples)
            bpds.append(np.asarray(bpd))
        # With a sharded sample axis the chain count is rounded up to
        # tile the axis — log the EFFECTIVE count (ADVICE r2).
        if self._sharded_eval is not None:
            num_samples = self._sharded_eval.effective_num_samples(
                num_samples)
        out = {"test_bpd": float(np.mean(np.concatenate(bpds))),
               "num_importance_samples": num_samples}
        opt = self.task.analytic_optimum_bpd()
        if opt is not None:
            out["test_gap_to_optimum"] = out["test_bpd"] - opt
        return out

    def _eval_batch(self, params, batch, rng, num_samples: int):
        """One batch of IW bpds — sample-axis-sharded when the mesh has a
        nontrivial 'sample' axis, plain jit otherwise."""
        if self._sharded_eval is not None:
            batch = jax.tree.map(jnp.asarray, batch)
            return self._sharded_eval(params, batch, rng, num_samples)
        return self._eval_step(params, self._shard(batch), rng, num_samples)

    def evaluate(self, params, num_samples: int, rng) -> dict:
        bpds = []
        for i, batch in enumerate(self.task.eval_batches()):
            bpd = self._eval_batch(params, batch,
                                   jax.random.fold_in(rng, i), num_samples)
            bpds.append(np.asarray(bpd))
        bpd = float(np.mean(np.concatenate(bpds)))
        out = {"bpd": bpd, "integrity_alarm": 0.0}
        opt = self.task.analytic_optimum_bpd()
        if opt is not None:
            out["bpd_gap_to_optimum"] = bpd - opt
            if bpd < opt - 0.1:
                # an IS likelihood bound below the analytic optimum (or
                # below 0) is mathematically impossible — it certifies the
                # flow is exploiting a numerics gap (see flows/softclamp.py).
                # The alarm is a structured field so campaign summaries see
                # it in metrics.jsonl, not just stdout (VERDICT r1 weak #11)
                out["integrity_alarm"] = 1.0
                print(f"WARNING: eval bpd {bpd:.3f} below analytic optimum "
                      f"{opt:.3f} — numerically invalid model, investigate",
                      flush=True)
        if bpd < 0:
            out["integrity_alarm"] = 1.0
            print(f"WARNING: negative eval bpd {bpd:.3f} — numerically "
                  "invalid model, investigate", flush=True)
        return out

    def _shard(self, batch: dict):
        # Single device_put per leaf straight from numpy (device_put
        # accepts host arrays) — the old jnp.asarray pre-pass was a second
        # full H2D transfer per batch.
        return mesh_lib.shard_batch(self.mesh, batch)

    def _shard_stacked(self, batch: dict):
        # [K, B, ...] multi-step stacks (steps_per_call > 1).
        return mesh_lib.shard_stacked_batch(self.mesh, batch)
