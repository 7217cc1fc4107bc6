"""Benchmark harness: prints ONE JSON line for the driver.

Runs the flagship set-shuffling training configuration on the available
accelerator (single TPU chip under the driver) and reports training
throughput in samples/s.  The reference never published throughput
(BASELINE.md), so ``vs_baseline`` is null.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from categoricalnf_tpu.tasks import SetShufflingTask
    from categoricalnf_tpu.training.state import OptimizerConfig, TrainState
    from categoricalnf_tpu.utils.jax_setup import setup_jax
    setup_jax()

    batch_size = 1024
    task = SetShufflingTask(set_size=16, batch_size=batch_size,
                            encoding_dim=4, num_layers=8, hidden_dim=96,
                            num_mixtures=8, compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    params = task.init_params(rng)
    tx = OptimizerConfig().build()
    state = TrainState.create(params, tx)

    batch = {"x": jnp.asarray(
        next(task.train_batches(np.random.default_rng(0)))["x"])}

    def train_step(state, batch, rng):
        def loss_fn(p):
            return task.loss(p, batch, rng, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=opt_state), loss

    step = jax.jit(train_step, donate_argnums=(0,))

    # Warmup/compile
    for i in range(3):
        state, loss = step(state, batch, jax.random.fold_in(rng, i))
    loss.block_until_ready()

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, batch, jax.random.fold_in(rng, 100 + i))
    loss.block_until_ready()
    dt = time.perf_counter() - t0

    samples_per_s = n_steps * batch_size / dt
    print(json.dumps({
        "metric": "set_shuffling_train_samples_per_s",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    # The TPU tunnel occasionally throws transient FailedPrecondition
    # errors; retry so the driver always records a measurement.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"bench attempt {attempt + 1} failed ({type(e).__name__}); "
                  "retrying in 120s", flush=True)
            time.sleep(120)
