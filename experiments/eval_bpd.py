"""Post-hoc likelihood evaluation of a finished run at a chosen
importance-sample count.

Reference parity: ``TaskTemplate.test()`` (SURVEY.md §3.2) run standalone
on a restored checkpoint — the reference evaluates final models with a
large importance-sample count to tighten the IW bound; the trainer's
in-run test uses ``final_eval_samples`` (default 32), and this CLI lets a
finished run be re-measured at IS-128/256 without retraining.  The IW
bound is monotone in the sample count (E[log 1/S Σ w] is nondecreasing in
S), so larger counts only tighten the reported bpd toward log p(x).

Usage:
    python experiments/eval_bpd.py --run runs/lm_v4 --num_samples 128 \
        --split test

Appends a JSON line {"prefix": "posthoc_<split>", ...} to the run's
metrics.jsonl and prints it.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from categoricalnf_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from categoricalnf_tpu.inference import load_run  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=str, required=True)
    ap.add_argument("--num_samples", type=int, default=128,
                    help="importance samples per example")
    ap.add_argument("--split", choices=["val", "test"], default="test")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--max_batches", type=int, default=0,
                    help="0 = full split")
    ap.add_argument("--no_write", action="store_true",
                    help="print only; do not append to metrics.jsonl "
                         "(use for smoke probes)")
    ap.add_argument("--compute_dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="override the run's compute dtype for this eval "
                         "(fp32 recommended for headline likelihoods: the "
                         "bf16 model is a slightly different density)")
    args = ap.parse_args()

    overrides = ({"compute_dtype": args.compute_dtype}
                 if args.compute_dtype else {})
    handle = load_run(args.run, **overrides)
    task = handle.task
    batches = (task.test_batches() if args.split == "test"
               else task.eval_batches())
    if args.max_batches:
        batches = batches[:args.max_batches]

    eval_step = jax.jit(task.eval_step, static_argnames=("num_samples",))
    rng = jax.random.PRNGKey(args.seed)
    bpds = []
    for i, batch in enumerate(batches):
        batch = jax.tree.map(jnp.asarray, batch)
        bpd = eval_step(handle.params, batch, jax.random.fold_in(rng, i),
                        num_samples=args.num_samples)
        bpds.append(np.asarray(bpd))
    out = {"prefix": f"posthoc_{args.split}",
           "step": handle.step,
           "bpd": float(np.mean(np.concatenate(bpds))),
           "num_importance_samples": args.num_samples,
           "num_batches": len(bpds),
           "compute_dtype": args.compute_dtype or "run-default",
           # partial-split probes must never displace a full-split test
           # bpd in summaries (summarize_runs skips partial rows)
           "partial": bool(args.max_batches)}
    opt = task.analytic_optimum_bpd()
    if opt is not None:
        out["gap_to_optimum"] = out["bpd"] - opt
    print(json.dumps(out))
    if not args.no_write:
        with open(os.path.join(args.run, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
