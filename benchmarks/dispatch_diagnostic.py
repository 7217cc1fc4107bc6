"""Isolate why bench.py (K=8 scan, 16 dispatches) reports ~35 steps/s while
the training engine honestly logs ~568 steps/s on the IDENTICAL flagship
config (runs/set16: batch 1024, 8 layers, hidden 96, bf16).

Five timed probes, one process, forced device->host reads around every
timed window (utils.timing.sync — block_until_ready is a no-op barrier on
the axon tunnel, ROUND3.md):

  1. engine-style  — single-step jit, N sequential dispatches, sync at
                     start+end (exactly what Trainer._train_step loops do)
  2. bench-style   — K=8 lax.scan multi-step, 16 dispatches, unique
                     [K,B,S] stacks per call (bench.py as of round 3)
  3. scan-reuse    — same as 2 but alternating two stacks (replay probe:
                     if faster than 2, the runtime replays matching args)
  4. rtt           — trivial jitted add, 30 calls, sync after EVERY call
                     (per-call round-trip floor through the tunnel)
  5. rtt-pipelined — same op, 30 calls, one sync at the end (per-call cost
                     when the dispatch queue is allowed to fill)

Interpretation matrix:
  1 fast, 2 slow          -> the K-scan/multi-call pattern is the problem
  1 slow                  -> the engine number is itself stale/wrong
  4 >> 5                  -> deep pipelining works; per-call RTT is hidden
                             whenever enough calls are in flight
  3 << 2                  -> replay artifact still alive (integrity!)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from categoricalnf_tpu.tasks import SetShufflingTask
from categoricalnf_tpu.training.state import OptimizerConfig, TrainState
from categoricalnf_tpu.utils.jax_setup import setup_jax
from categoricalnf_tpu.utils.timing import sync


def main():
    setup_jax()
    batch_size = 1024
    task = SetShufflingTask(set_size=16, batch_size=batch_size,
                            encoding_dim=4, num_layers=8, hidden_dim=96,
                            num_mixtures=8, compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    params = task.init_params(rng)
    tx = OptimizerConfig().build()
    state = TrainState.create(params, tx)
    gen = task.train_batches(np.random.default_rng(0))

    def train_step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            return task.loss(p, batch, step_rng, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=opt_state), loss

    results = {}

    # ---- probe 1: engine-style single-step loop -------------------------
    step1 = jax.jit(train_step, donate_argnums=(0,))
    pool = [{"x": jnp.asarray(next(gen)["x"])} for _ in range(16)]
    for i in range(3):
        state, loss = step1(state, pool[i % 16], rng)
    sync(loss)
    n = 512
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step1(state, pool[i % 16], rng)
    sync(loss)
    dt = time.perf_counter() - t0
    results["engine_style_steps_per_s"] = n / dt
    print(f"1 engine-style : {n / dt:9.1f} steps/s  ({dt:.3f}s /{n})",
          flush=True)

    # ---- probe 2: bench-style K=8 scan, unique stacks --------------------
    K, n_calls = 8, 16
    def multi_step(state, batches, rng):
        def body(st, b):
            return train_step(st, b, rng)
        return jax.lax.scan(body, state, batches)

    stepK = jax.jit(multi_step, donate_argnums=(0,))
    stacks = [{"x": jnp.stack([jnp.asarray(next(gen)["x"])
                               for _ in range(K)])}
              for _ in range(3 + n_calls)]
    rngs = [jax.random.fold_in(rng, 10_000 + i) for i in range(3 + n_calls)]
    for i in range(3):
        state, loss = stepK(state, stacks[i], rngs[i])
    sync(loss)
    t0 = time.perf_counter()
    for i in range(3, 3 + n_calls):
        state, loss = stepK(state, stacks[i], rngs[i])
    sync(loss)
    dt = time.perf_counter() - t0
    results["bench_style_steps_per_s"] = n_calls * K / dt
    print(f"2 bench-style  : {n_calls * K / dt:9.1f} steps/s  "
          f"({dt:.3f}s /{n_calls} calls of K={K})", flush=True)

    # ---- probe 3: K=8 scan, two alternating stacks (replay probe) -------
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, loss = stepK(state, stacks[i % 2], rngs[i % 2])
    sync(loss)
    dt = time.perf_counter() - t0
    results["scan_reuse_steps_per_s"] = n_calls * K / dt
    print(f"3 scan-reuse   : {n_calls * K / dt:9.1f} steps/s  "
          f"(ALTERNATING args — faster than 2 means replay artifact)",
          flush=True)

    # ---- probe 4/5: trivial-op RTT, synced vs pipelined ------------------
    tiny = jax.jit(lambda a, b: a + b)
    a = jnp.ones((8, 8), jnp.float32)
    sync(tiny(a, a * 2))
    n = 30
    t0 = time.perf_counter()
    for i in range(n):
        out = tiny(a, a + float(i))
        sync(out)
    per_call_sync = (time.perf_counter() - t0) / n
    results["rtt_synced_ms"] = per_call_sync * 1e3
    print(f"4 rtt synced   : {per_call_sync * 1e3:9.2f} ms/call", flush=True)

    t0 = time.perf_counter()
    for i in range(n):
        out = tiny(a, a + float(n + i))
    sync(out)
    per_call_pipe = (time.perf_counter() - t0) / n
    results["rtt_pipelined_ms"] = per_call_pipe * 1e3
    print(f"5 rtt pipelined: {per_call_pipe * 1e3:9.2f} ms/call", flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
