"""Profile the flagship train step on the real chip (VERDICT r2 next #3).

Two outputs:
  1. a ``jax.profiler`` trace of the honest step (view with
     tensorboard-plugin-profile) under ``--out``;
  2. a printed lever table measured on-device: dispatch-amortization
     sweep (steps_per_call K = 1,2,4,8,16), batch-size sweep, and a
     component split (forward loss vs backward vs optimizer) so the
     bottleneck claim in PERFORMANCE.md is profile-backed instead of
     being calibrated against a replay artifact (VERDICT r2 weak #1).

Run on an IDLE chip (campaign gap) — contending with a live training
through the tunnel produces numbers above the roofline.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _build(batch_size: int):
    import os
    from categoricalnf_tpu.tasks import SetShufflingTask
    from categoricalnf_tpu.training.state import OptimizerConfig, TrainState
    # Match the shipped bench default (remat=1) so the trace/lever table
    # describes the POST-remat program (VERDICT r4 #4: "capture a
    # post-remat profiler trace").
    task = SetShufflingTask(
        set_size=16, batch_size=batch_size,
        encoding_dim=4, num_layers=8, hidden_dim=96,
        num_mixtures=8, compute_dtype="bfloat16",
        remat=os.environ.get("CNF_BENCH_REMAT", "1") not in ("", "0"),
        unroll=int(os.environ.get("CNF_BENCH_UNROLL", "1")))
    rng = jax.random.PRNGKey(0)
    params = task.init_params(rng)
    tx = OptimizerConfig().build()
    state = TrainState.create(params, tx)
    gen = task.train_batches(np.random.default_rng(0))
    return task, tx, state, gen, rng


def _time(fn, args_fn, n: int, warmup: int = 3) -> float:
    """Median-of-3 of n-call wall time; args_fn(i) supplies varying args.

    Windows end with a forced device->host value read: block_until_ready
    returns after ENQUEUE on the tunnel platform (utils/timing.sync), so
    blocking on it times dispatch, not execution."""
    from categoricalnf_tpu.utils.timing import sync
    out = None
    for i in range(warmup):
        out = fn(*args_fn(i))
    sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*args_fn(i))
        sync(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[1] / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/cnf_profile")
    ap.add_argument("--trace_steps", type=int, default=8)
    args = ap.parse_args()
    from categoricalnf_tpu.utils.jax_setup import setup_jax
    setup_jax()
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev.platform)}", flush=True)

    # ---- K sweep at B=1024 (dispatch amortization) ----------------------
    B = 1024
    task, tx, state, gen, rng = _build(B)

    def train_step(st, batch, base_rng):
        srng = jax.random.fold_in(base_rng, st.step)

        def loss_fn(p):
            return task.loss(p, batch, srng, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        from categoricalnf_tpu.training.state import TrainState
        return TrainState(step=st.step + 1,
                          params=optax.apply_updates(st.params, updates),
                          opt_state=opt_state), loss

    print("\nK-sweep (steps_per_call) at B=1024:")
    results = {}
    for K in (1, 2, 4, 8, 16):
        stacks = [
            {"x": jnp.stack([jnp.asarray(next(gen)["x"]) for _ in range(K)])}
            for _ in range(2)
        ]

        def multi(st, batches, r):
            return jax.lax.scan(lambda s, b: train_step(s, b, r),
                                st, batches)

        fn = jax.jit(multi)
        st = state

        def call(i, fn=fn, stacks=stacks):
            nonlocal st
            st, loss = fn(st, stacks[i % 2], rng)
            return loss

        dt = _time(lambda *a: call(a[0]), lambda i: (i,),
                   n=max(8, 64 // K))
        per_step = dt / K
        results[K] = per_step
        print(f"  K={K:>2}: {per_step * 1e6:8.1f} us/step  "
              f"({B / per_step:,.0f} samples/s)", flush=True)

    # ---- batch sweep at the best K ---------------------------------------
    bestK = min(results, key=results.get)
    print(f"\nbatch sweep at K={bestK}:")
    for Bs in (1024, 2048, 4096):
        task2, tx2, state2, gen2, rng2 = _build(Bs)

        def tstep(st, batch, r, task2=task2, tx2=tx2):
            srng = jax.random.fold_in(r, st.step)
            loss, grads = jax.value_and_grad(
                lambda p: task2.loss(p, batch, srng, 1.0))(st.params)
            up, opt = tx2.update(grads, st.opt_state, st.params)
            from categoricalnf_tpu.training.state import TrainState
            return TrainState(step=st.step + 1,
                              params=optax.apply_updates(st.params, up),
                              opt_state=opt), loss

        stacks = [
            {"x": jnp.stack([jnp.asarray(next(gen2)["x"])
                             for _ in range(bestK)])}
            for _ in range(2)
        ]
        fn = jax.jit(lambda st, bs, r: jax.lax.scan(
            lambda s, b: tstep(s, b, r), st, bs))
        st = state2

        def call(i):
            nonlocal st
            st, loss = fn(st, stacks[i % 2], rng2)
            return loss

        dt = _time(lambda *a: call(a[0]), lambda i: (i,),
                   n=max(4, 32 // bestK))
        per_step = dt / bestK
        print(f"  B={Bs:>5}: {per_step * 1e6:8.1f} us/step  "
              f"({Bs / per_step:,.0f} samples/s)", flush=True)

    # ---- component split at B=1024, K=1 ----------------------------------
    print("\ncomponent split at B=1024 (per call):")
    batch = {"x": jnp.asarray(next(gen)["x"])}
    fwd = jax.jit(lambda p, b, r: task.loss(p, b, r, 1.0))
    grad = jax.jit(lambda p, b, r: jax.value_and_grad(
        lambda pp: task.loss(pp, b, r, 1.0))(p))
    params = state.params
    t_f = _time(lambda i: fwd(params, batch, jax.random.fold_in(rng, i)),
                lambda i: (i,), n=32)
    t_g = _time(lambda i: grad(params, batch, jax.random.fold_in(rng, i)),
                lambda i: (i,), n=32)
    print(f"  forward loss     : {t_f * 1e6:8.1f} us")
    print(f"  value_and_grad   : {t_g * 1e6:8.1f} us")
    print(f"  full step (K-amortized best): {results[bestK] * 1e6:8.1f} us",
          flush=True)

    # ---- compiled-program memory analysis ---------------------------------
    # Where the HBM residency goes (args vs outputs vs XLA temp buffers) —
    # the temp size is the activation working set the remat trade shrinks.
    try:
        compiled = grad.lower(params, batch, rng).compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            gb = 1 / 1e9
            print("memory analysis (value_and_grad program):")
            print(f"  arguments : {ma.argument_size_in_bytes * gb:7.3f} GB")
            print(f"  outputs   : {ma.output_size_in_bytes * gb:7.3f} GB")
            print(f"  temp      : {ma.temp_size_in_bytes * gb:7.3f} GB")
            print(f"  generated code: "
                  f"{ma.generated_code_size_in_bytes * gb:7.3f} GB",
                  flush=True)
    except Exception as e:  # noqa: BLE001 — backend-dependent API
        print(f"memory analysis unavailable: {type(e).__name__}")

    # ---- profiler trace of the honest step --------------------------------
    stacks = [{"x": jnp.stack([jnp.asarray(next(gen)["x"])
                               for _ in range(8)])} for _ in range(2)]
    fn = jax.jit(lambda st, bs, r: jax.lax.scan(
        lambda s, b: train_step(s, b, r), st, bs))
    st = state
    from categoricalnf_tpu.utils.timing import sync
    st, loss = fn(st, stacks[0], rng)  # compile outside the trace
    sync(loss)
    jax.profiler.start_trace(args.out)
    for i in range(args.trace_steps):
        st, loss = fn(st, stacks[i % 2], rng)
    sync(loss)
    jax.profiler.stop_trace()
    print(f"\ntrace written to {args.out}", flush=True)


if __name__ == "__main__":
    main()
