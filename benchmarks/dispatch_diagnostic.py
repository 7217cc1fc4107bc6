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

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from categoricalnf_tpu.tasks import SetShufflingTask
from categoricalnf_tpu.training.state import OptimizerConfig, TrainState
from categoricalnf_tpu.utils.jax_setup import setup_jax
from categoricalnf_tpu.utils.timing import sync


def main():
    import os
    if os.environ.get("CNF_DIAG_CPU"):  # correctness smoke-run off-chip
        jax.config.update("jax_platforms", "cpu")
    setup_jax()
    batch_size = int(os.environ.get("CNF_DIAG_BATCH", "1024"))
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
    try:
        cost = step1.lower(state, pool[0], rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        interesting = {k: v for k, v in cost.items()
                       if k in ("flops", "bytes accessed", "transcendentals",
                                "optimal_seconds")
                       or k.startswith("bytes accessed")}
        print("0 cost_analysis:", {k: f"{v:.3e}" for k, v in
                                   sorted(interesting.items())}, flush=True)
        results["cost_analysis"] = {k: float(v) for k, v in
                                    interesting.items()}
    except Exception as e:  # noqa: BLE001
        print(f"0 cost_analysis unavailable: {type(e).__name__}", flush=True)
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

    # ---- probe 6: K=8 at batch 4096 (batch scaling of the 28 ms/step) ----
    task4 = SetShufflingTask(set_size=16, batch_size=4096,
                             encoding_dim=4, num_layers=8, hidden_dim=96,
                             num_mixtures=8, compute_dtype="bfloat16")
    gen4 = task4.train_batches(np.random.default_rng(1))

    def train_step4(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(
            lambda p: task4.loss(p, batch, step_rng, 1.0))(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return TrainState(step=state.step + 1,
                          params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state), loss

    def multi4(state, batches, rng):
        return jax.lax.scan(lambda st, b: train_step4(st, b, rng),
                            state, batches)

    step4 = jax.jit(multi4, donate_argnums=(0,))
    st4 = TrainState.create(task4.init_params(jax.random.PRNGKey(1)), tx)
    stacks4 = [{"x": jnp.stack([jnp.asarray(next(gen4)["x"])
                                for _ in range(K)])} for _ in range(2 + 6)]
    for i in range(2):
        st4, loss = step4(st4, stacks4[i], rngs[i])
    sync(loss)
    t0 = time.perf_counter()
    for i in range(2, 8):
        st4, loss = step4(st4, stacks4[i], rngs[i])
    sync(loss)
    dt = time.perf_counter() - t0
    results["b4096_steps_per_s"] = 6 * K / dt
    results["b4096_samples_per_s"] = 6 * K * 4096 / dt
    print(f"6 batch 4096   : {6 * K / dt:9.1f} steps/s = "
          f"{6 * K * 4096 / dt:11.0f} samples/s", flush=True)

    # ---- probe 7: raw tunnel transfer bandwidth --------------------------
    big = np.random.default_rng(2).standard_normal((2048, 1024),
                                                   dtype=np.float32)  # 8MB
    t0 = time.perf_counter()
    dev = jnp.asarray(big)
    sync(dev[:1, :1])
    up = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = np.asarray(dev)
    down = time.perf_counter() - t0
    results["h2d_MBps"] = 8.0 / up
    results["d2h_MBps"] = 8.0 / down
    print(f"7 transfer     : h2d {8/up:8.1f} MB/s   d2h {8/down:8.1f} MB/s",
          flush=True)

    # ---- probe 8: pure device compute, no per-call args ------------------
    # 64 training steps per call on SELF-GENERATED device data (random
    # permutations from the rng) — the only per-call host traffic is the
    # donated state handle + one rng.  If this still costs ~28 ms/step the
    # cost is genuinely device-side compute; if it collapses toward the
    # MXU/VPU estimate, the overhead lives in per-call argument handling.
    def self_feeding(state, rng):
        def body(st, r):
            keys = jax.random.split(r, batch_size)
            x = jax.vmap(lambda k: jax.random.permutation(k, 16))(keys)
            return train_step(st, {"x": x.astype(jnp.int32)}, r)
        return jax.lax.scan(body, state, jax.random.split(rng, 64))

    step8 = jax.jit(self_feeding, donate_argnums=(0,))
    st8 = TrainState.create(task.init_params(jax.random.PRNGKey(2)), tx)
    st8, loss = step8(st8, jax.random.fold_in(rng, 777))
    sync(loss)
    t0 = time.perf_counter()
    for i in range(4):
        st8, loss = step8(st8, jax.random.fold_in(rng, 800 + i))
    sync(loss)
    dt = time.perf_counter() - t0
    results["selffeed_steps_per_s"] = 4 * 64 / dt
    print(f"8 self-feeding : {4 * 64 / dt:9.1f} steps/s  "
          f"(no per-step host args)", flush=True)

    # ---- probe 9: on-device component budget ------------------------------
    # Each component runs 50 sequential reps INSIDE one jit call with the
    # output threaded through the carry (defeats DCE/hoisting), so per-rep
    # time is pure device execution.  If 9a+9b+9c roughly sum to the
    # per-step time from probe 1/2, the 28 ms is real compute and the
    # largest row is the kernel-work target; if they sum to much less,
    # the cost is in the glue (scan/donation/rng/one-hot).
    from categoricalnf_tpu.flows.coupling import MixtureCDFCoupling
    from categoricalnf_tpu.networks.transformer import SetTransformer
    from categoricalnf_tpu.ops import numerics as nm

    REPS = 50
    net = SetTransformer(hidden_dim=96, num_layers=2,
                         compute_dtype="bfloat16")
    net_p = net.init(jax.random.PRNGKey(3), 4, 4 * (2 + 3 * 8))
    z0 = jax.random.normal(jax.random.PRNGKey(4), (batch_size, 16, 4))

    def net_loop(p, z):
        def body(i, z):
            out = net.apply(p, z)  # [B,16,104]
            return z + 1e-3 * out[..., :4].astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, z)

    f9a = jax.jit(net_loop)
    sync(f9a(net_p, z0))
    t0 = time.perf_counter()
    sync(f9a(net_p, z0 * 1.0001))
    dt9a = (time.perf_counter() - t0) / REPS
    results["net_apply_ms"] = dt9a * 1e3
    print(f"9a net.apply   : {dt9a * 1e3:9.3f} ms/rep  (x16 per fwd+bwd "
          f"step ~= {dt9a * 16 * 1e3:7.2f} ms)", flush=True)

    K8 = 8
    pi = jax.random.normal(jax.random.PRNGKey(5), (batch_size, 16, 4, K8))
    mu = jax.random.normal(jax.random.PRNGKey(6), (batch_size, 16, 4, K8))
    ls = jax.random.normal(jax.random.PRNGKey(7), (batch_size, 16, 4, K8)) \
        * 0.1

    def mix_loop(z, pi, mu, ls):
        def body(i, z):
            y, ldj = nm.mixture_logit_cdf_and_ldj(z, pi, mu, ls)
            return jnp.tanh(y) + 1e-3 * ldj
        return jax.lax.fori_loop(0, REPS, body, z)

    f9b = jax.jit(mix_loop)
    sync(f9b(z0, pi, mu, ls))
    t0 = time.perf_counter()
    sync(f9b(z0 * 1.0001, pi, mu, ls))
    dt9b = (time.perf_counter() - t0) / REPS
    results["mixture_fwd_ms"] = dt9b * 1e3
    print(f"9b mixture math: {dt9b * 1e3:9.3f} ms/rep  (x8 layers fwd "
          f"~= {dt9b * 8 * 1e3:7.2f} ms)", flush=True)

    def opt_loop(state):
        def body(i, st):
            grads = jax.tree.map(lambda p: p * 1e-4 + 1e-5 * i, st.params)
            up, opt = tx.update(grads, st.opt_state, st.params)
            return TrainState(step=st.step + 1,
                              params=optax.apply_updates(st.params, up),
                              opt_state=opt)
        return jax.lax.fori_loop(0, REPS, body, state)

    st9 = TrainState.create(task.init_params(jax.random.PRNGKey(8)), tx)
    f9c = jax.jit(opt_loop, donate_argnums=(0,))
    st9 = f9c(st9)
    sync(st9.params)
    t0 = time.perf_counter()
    st9 = f9c(st9)
    sync(st9.params)
    dt9c = (time.perf_counter() - t0) / REPS
    results["optimizer_ms"] = dt9c * 1e3
    print(f"9c optimizer   : {dt9c * 1e3:9.3f} ms/rep", flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
