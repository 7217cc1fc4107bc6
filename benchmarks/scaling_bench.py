"""Scaling-efficiency report (BASELINE.md: samples/s at 1 chip / 1 host /
N hosts, >= 80% linear scaling target).

Weak-scaling measurement: fixed PER-DEVICE batch, mesh grown over the
available devices; efficiency = throughput(n) / (n * throughput(1)).

On this environment only ONE physical TPU chip is reachable, so the
hardware numbers cover 1 chip; the same harness run on a v5e slice or
multi-host deployment (via CNF_COORDINATOR_ADDRESS) produces the full
report.  ``--cpu N`` runs the harness on N virtual CPU devices to verify
the sharded step scales mechanically (correctness of the path, not TPU
bandwidth).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="use N virtual CPU devices instead of accelerators")
    ap.add_argument("--per_device_batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--task", type=str, default="set",
                    choices=["set", "molecules"],
                    help="flagship set task, or GraphCNF on synthetic "
                    "molecules (masked graphs, three latent streams - the "
                    "hard partitioning case; VERDICT r2 weak #7)")
    ap.add_argument("--fixed_total", type=int, default=0,
                    help="fixed TOTAL batch over a growing mesh: on shared "
                    "silicon (virtual CPU devices) ideal is FLAT throughput "
                    "and the drop measures partitioning/collective overhead "
                    "— meaningful where weak scaling saturates the cores")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.cpu}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from categoricalnf_tpu import parallel
    from categoricalnf_tpu.tasks import SetShufflingTask
    from categoricalnf_tpu.tasks.molecules import MoleculeTask
    from categoricalnf_tpu.training.state import OptimizerConfig, TrainState

    def build_task(batch_size):
        if args.task == "molecules":
            return MoleculeTask(
                dataset="synthetic", max_nodes=16, batch_size=batch_size,
                num_layers_node=4, num_layers_edge=4, hidden_dim=96,
                num_mixtures=8, synth_size=1024,
                node_cond_atoms=True, bond_cond_degree=True,
                compute_dtype="float32" if args.cpu else "bfloat16")
        return SetShufflingTask(
            set_size=16, batch_size=batch_size,
            encoding_dim=4, num_layers=8, hidden_dim=96, num_mixtures=8,
            compute_dtype="float32" if args.cpu else "bfloat16")

    n_avail = len(jax.devices())
    sizes = [n for n in [1, 2, 4, 8, 16, 32] if n <= n_avail]
    if args.fixed_total:
        # the global batch must tile every mesh in the sweep, or the
        # sweep crashes at its largest size after minutes of compile
        m = max(sizes)
        rounded = (args.fixed_total // m) * m
        if rounded != args.fixed_total:
            print(f"fixed_total {args.fixed_total} rounded to {rounded} "
                  f"(multiple of the largest mesh size {m})")
            args.fixed_total = rounded
    results = {}
    for n in sizes:
        task = build_task(args.fixed_total or args.per_device_batch * n)
        mesh = parallel.create_mesh(num_data=n, num_sample=1,
                                    devices=jax.devices()[:n])
        rng = jax.random.PRNGKey(0)
        params = task.init_params(rng)
        tx = OptimizerConfig().build()
        state = TrainState.create(params, tx)
        state = jax.device_put(state, parallel.replicated(mesh))
        batch_np = next(task.train_batches(np.random.default_rng(0)))
        batch = parallel.shard_batch(
            mesh, {k: jnp.asarray(v) for k, v in batch_np.items()})

        def train_step(state, batch, rng):
            def loss_fn(p):
                return task.loss(p, batch, rng, 1.0)
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            u, opt_state = tx.update(grads, state.opt_state, state.params)
            return TrainState(step=state.step + 1,
                              params=optax.apply_updates(state.params, u),
                              opt_state=opt_state), loss

        step = jax.jit(train_step, donate_argnums=(0,))
        for i in range(3):
            state, loss = step(state, batch, jax.random.fold_in(rng, i))
        loss.block_until_ready()
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, loss = step(state, batch, jax.random.fold_in(rng, 9 + i))
        loss.block_until_ready()
        dt = time.perf_counter() - t0
        sps = args.steps * task.batch_size / dt
        results[n] = sps
        if args.fixed_total:
            eff = sps / results[1] if 1 in results else 1.0
            print(f"devices={n:3d}  samples/s={sps:12.1f}  "
                  f"vs_single_device={eff:6.3f}  (fixed total batch "
                  f"{task.batch_size}; 1.0 = zero partitioning overhead)")
        else:
            eff = sps / (n * results[1]) if 1 in results else 1.0
            print(f"devices={n:3d}  samples/s={sps:12.1f}  "
                  f"scaling_efficiency={eff:6.3f}")
    print(json.dumps({str(k): v for k, v in results.items()}))


if __name__ == "__main__":
    main()
