"""LM throughput benchmark: train tokens/s, IW-eval tokens/s, sampling
chars/s (the sequential scan + mixture-CDF inverse path)."""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timeit(fn, iters=10):
    """fn(i) -> output; inputs MUST vary with i (identical-arg replays can
    be deduplicated by the runtime and report impossible speeds), and the
    window must end with a forced device->host read: block_until_ready
    returns after ENQUEUE on the tunnel platform (utils/timing.sync)."""
    from categoricalnf_tpu.utils.timing import sync
    out = fn(0)
    sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(1 + i)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import argparse
    from categoricalnf_tpu.tasks import LanguageModelingTask
    from categoricalnf_tpu.training.state import OptimizerConfig, TrainState
    from categoricalnf_tpu.utils.jax_setup import setup_jax
    setup_jax()

    ap = argparse.ArgumentParser()
    ap.add_argument("--net", type=str, default="lstm",
                    choices=["lstm", "transformer"])
    ap.add_argument("--hidden_dim", type=int, default=512)
    args = ap.parse_args()

    B, T = 128, 256
    task = LanguageModelingTask(corpus_name="synthetic", seq_len=T,
                                batch_size=B, encoding_dim=3, num_layers=2,
                                hidden_dim=args.hidden_dim, lstm_layers=2,
                                num_mixtures=16, net=args.net,
                                compute_dtype="bfloat16")
    print(f"net={args.net} hidden={args.hidden_dim} B={B} T={T}")
    rng = jax.random.PRNGKey(0)
    params = task.init_params(rng)
    tx = OptimizerConfig().build()
    state = TrainState.create(params, tx)
    gen = task.train_batches(np.random.default_rng(0))
    pool = [{"x": jnp.asarray(next(gen)["x"])} for _ in range(8)]
    batch = pool[0]

    def train_step(state, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: task.loss(p, batch, rng, 1.0))(state.params)
        u, opt_state = tx.update(grads, state.opt_state, state.params)
        return TrainState(step=state.step + 1,
                          params=optax.apply_updates(state.params, u),
                          opt_state=opt_state), loss

    # Chained measurement: thread the state through N steps (like the real
    # trainer) so no runtime trick can skip or overlap executions, and take
    # wall clock over the chain.
    step = jax.jit(train_step, donate_argnums=(0,))
    from bench import peak_flops, step_costs
    flops, _ = step_costs(step.lower(state, batch, rng).compile())
    from categoricalnf_tpu.utils.timing import sync
    state, loss = step(state, batch, rng)
    sync(loss)
    n = 30
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, pool[i % len(pool)],
                           jax.random.fold_in(rng, i))
    sync(loss)
    t = (time.perf_counter() - t0) / n
    print(f"train: {B * T / t / 1e6:8.2f} M tokens/s  ({t*1e3:.2f} ms/step)")
    peak = peak_flops(jax.devices()[0])
    if flops and peak:
        print(f"  roofline: {flops/1e9:.1f} GFLOP/step -> "
              f"{flops / t / 1e12:.2f} TFLOP/s = {flops / t / peak:.1%} "
              f"of bf16 peak ({peak/1e12:.0f} TFLOP/s)")
        if t < flops / peak:
            print(f"  *** IMPOSSIBLE: {t*1e3:.2f} ms/step is below the "
                  f"{flops/peak*1e3:.2f} ms compute floor at peak — the "
                  "measurement is an async/replay artifact, DISCARD it")

    eval_fn = jax.jit(lambda p, b, r: task.eval_step(p, b, r, 8))
    t = timeit(lambda i: eval_fn(state.params, batch,
                                 jax.random.fold_in(rng, i)), iters=5)
    print(f"eval(IW8): {B * T / t / 1e6:6.2f} M tokens/s ({t*1e3:.2f} ms)")

    sample_fn = jax.jit(lambda p, r: task.model.sample(p, r, batch=B,
                                                       num_pos=T))
    t = timeit(lambda i: sample_fn(state.params,
                                   jax.random.fold_in(rng, i)), iters=3)
    print(f"sample: {B * T / t / 1e3:8.1f} K chars/s ({t*1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
