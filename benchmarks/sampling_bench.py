"""Ancestral-sampling throughput: forced-sync samples/s on the jit-compiled
sampling path of each model family.

VERDICT r4 #3b/#4: post-barrier-fix the repo had honest *training*
throughput only; the north star ("jit-compiled ancestral sampling at
speed-of-light per chip") had zero surviving numbers.  This harness times
the full sampling pipeline — prior sample -> inverse flow (including the
Pallas rtsafe mixture-CDF inverse at dispatch sizes, ops/dispatch.py) ->
posterior decode — with the repo's honest-timing rules:

  * every call gets a UNIQUE folded rng (identical-arg replays can be
    deduplicated by the tunnel runtime and report impossible times);
  * every timed window ends with a forced device->host value read
    (utils/timing.sync; block_until_ready returns after ENQUEUE here).

Params are random-init: sampling cost is shape-static (fixed rtsafe
iteration count, fixed scan lengths), so trained weights change the
numbers sampled, not the wall clock.  LM sampling tokens/s lives in
lm_bench.py (same timing rules).

Usage:
    python benchmarks/sampling_bench.py [--surfaces set,coloring,molecules]
        [--iters 8] [--json out.json]

Prints one JSON line per surface.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from categoricalnf_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from categoricalnf_tpu.utils.timing import sync  # noqa: E402


def timed(fn, iters, warmup=2):
    """Mean seconds/call; fn(i) must vary its args with i.  Warmup uses
    large positive indices: fold_in requires a non-negative (uint32)
    index, so negative warmup markers crash."""
    out = None
    for i in range(warmup):
        out = fn(1_000_000 + i)
    sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i)
    sync(out)
    return (time.perf_counter() - t0) / iters


def bench_set(rng, iters):
    from categoricalnf_tpu.tasks import SetShufflingTask
    B, S = 1024, 16
    task = SetShufflingTask(set_size=S, batch_size=B, encoding_dim=4,
                            num_layers=8, hidden_dim=96, num_mixtures=8,
                            compute_dtype="bfloat16")
    params = task.init_params(rng)
    fn = jax.jit(lambda p, k: task.model.sample(p, k, batch=B, num_pos=S))
    t = timed(lambda i: fn(params, jax.random.fold_in(rng, i)), iters)
    return {"metric": "set_shuffling_sample_sets_per_s",
            "value": round(B / t, 1), "unit": "sets/s",
            "batch_size": B, "ms_per_batch": round(t * 1e3, 2)}


def bench_coloring(rng, iters):
    from categoricalnf_tpu.tasks.graph_coloring import GraphColoringTask
    task = GraphColoringTask(batch_size=256, num_layers=6, hidden_dim=96,
                             num_mixtures=8, encoding_dim=2)
    params = task.init_params(rng)
    batch = task._gen(np.random.default_rng(0), task.batch_size)
    adj = jnp.asarray(batch["cond"]["adj"])
    mask = jnp.asarray(batch["mask"])
    fn = jax.jit(lambda p, k: task.model.sample(
        p, k, batch=task.batch_size, num_pos=task.max_nodes,
        cond={"adj": adj}, mask=mask))
    t = timed(lambda i: fn(params, jax.random.fold_in(rng, i)), iters)
    return {"metric": "coloring_sample_graphs_per_s",
            "value": round(task.batch_size / t, 1), "unit": "graphs/s",
            "batch_size": task.batch_size,
            "ms_per_batch": round(t * 1e3, 2)}


def bench_molecules(rng, iters):
    from categoricalnf_tpu.tasks.molecules import MoleculeTask
    # zinclike250k production architecture (runs/molecules_v7); synthetic
    # dataset so the bench needs no data/*.npz regeneration.
    task = MoleculeTask(dataset="synthetic", batch_size=192, hidden_dim=256,
                        num_layers_node=6, num_layers_edge=8,
                        num_layers_bond=12, num_mixtures=16,
                        node_cond_atoms=True, bond_cond_degree=True,
                        compute_dtype="bfloat16")
    params = task.init_params(rng)
    np_rng = np.random.default_rng(0)
    masks = [jnp.asarray(task.sample_node_mask(np_rng, task.batch_size))
             for _ in range(4)]
    temps = jnp.ones((3,), jnp.float32)
    fn = jax.jit(lambda p, k, m, t: task.model.sample(p, k, m,
                                                      temperature=t))
    t = timed(lambda i: fn(params, jax.random.fold_in(rng, i),
                           masks[i % len(masks)], temps), iters)
    return {"metric": "graphcnf_sample_molecules_per_s",
            "value": round(task.batch_size / t, 1), "unit": "molecules/s",
            "batch_size": task.batch_size,
            "ms_per_batch": round(t * 1e3, 2)}


SURFACES = {"set": bench_set, "coloring": bench_coloring,
            "molecules": bench_molecules}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--surfaces", default="set,coloring,molecules")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--json", default=None,
                    help="also append rows to this file")
    args = ap.parse_args()
    rng = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", None) or dev.platform
    rows = []
    for name in args.surfaces.split(","):
        row = SURFACES[name](jax.random.fold_in(rng, hash(name) % 2**31),
                             args.iters)
        row["device"] = kind
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.json:
        with open(args.json, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
