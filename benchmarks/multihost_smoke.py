"""Multi-host smoke test without a cluster: 2 local processes, one mesh.

Exercises the REAL multi-host path (BASELINE.md: "≥2 hosts"):
``jax.distributed.initialize`` with a localhost coordinator, a global mesh
spanning both processes' CPU devices, per-process local batch shards
assembled into one global array, and a jitted data-parallel train step
whose gradient reduction crosses the process boundary.

Run:  python benchmarks/multihost_smoke.py
Each process prints its loss; they must match bit-for-bit (same global
computation) and be finite.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

PORT = 17733
NUM_PROCS = 2
DEVICES_PER_PROC = 2


def worker(pid: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=NUM_PROCS, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from categoricalnf_tpu import parallel
    from categoricalnf_tpu.tasks import SetShufflingTask
    from categoricalnf_tpu.training.state import OptimizerConfig, TrainState

    n_global = len(jax.devices())
    assert n_global == NUM_PROCS * DEVICES_PER_PROC, jax.devices()
    mesh = parallel.create_mesh(num_data=n_global, num_sample=1)
    data_sh = parallel.batch_sharding(mesh)

    task = SetShufflingTask(set_size=8, batch_size=64, encoding_dim=2,
                            num_layers=2, hidden_dim=32, num_mixtures=4,
                            compute_dtype="float32")
    rng = jax.random.PRNGKey(0)
    params = task.init_params(rng)  # deterministic → identical on all procs
    tx = OptimizerConfig().build()
    state = TrainState.create(params, tx)
    state = jax.device_put(state, parallel.replicated(mesh))

    # Global batch from per-process local shards.
    full = np.asarray(next(task.train_batches(
        np.random.default_rng(0)))["x"])  # same on both procs (seeded)
    per_proc = full.shape[0] // NUM_PROCS
    local = full[pid * per_proc:(pid + 1) * per_proc]
    x_global = jax.make_array_from_process_local_data(data_sh, local,
                                                      full.shape)

    def train_step(state, x, rng):
        loss, grads = jax.value_and_grad(
            lambda p: task.loss(p, {"x": x}, rng, 1.0))(state.params)
        u, opt_state = tx.update(grads, state.opt_state, state.params)
        return TrainState(step=state.step + 1,
                          params=optax.apply_updates(state.params, u),
                          opt_state=opt_state), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    for i in range(3):
        state, loss = step(state, x_global, jax.random.fold_in(rng, i))
    print(f"proc {pid}: loss after 3 multihost steps = {float(loss):.6f}",
          flush=True)
    assert np.isfinite(float(loss))

    # Throughput at >=2 hosts (BASELINE.md reporting row).  Chained
    # donated state + per-step rng keeps every step distinct (the
    # identical-arg replay gotcha); on real multi-host TPU slices this
    # same script reports the real number.
    import time
    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, x_global, jax.random.fold_in(rng, 100 + i))
    loss.block_until_ready()
    dt = time.perf_counter() - t0
    if pid == 0:
        sps = n_steps * full.shape[0] / dt
        backend = jax.devices()[0].platform
        print(f"multihost throughput ({NUM_PROCS} procs x "
              f"{DEVICES_PER_PROC} {backend} devices): {sps:.0f} samples/s "
              f"(global batch {full.shape[0]})", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    procs = []
    for pid in range(NUM_PROCS):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid)], env=env))
    codes = [p.wait(timeout=600) for p in procs]
    assert all(c == 0 for c in codes), codes
    print("multihost smoke OK")


if __name__ == "__main__":
    main()
