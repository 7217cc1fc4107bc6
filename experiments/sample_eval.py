"""Post-hoc sample-quality evaluation of a finished run, with a prior
temperature sweep.

The flow-sampling temperature (prior scale, SURVEY.md C8/C9) is the
standard validity/diversity knob: T<1 concentrates prior mass near the
mode, typically raising molecule validity / coloring validity at some
cost in diversity (uniqueness/novelty).  The trainer evaluates at T=1
only; this CLI loads the best checkpoint of a run via the inference API
and reports sample metrics at each requested temperature, on a
CI-sized sample count (default 1024).

Usage:
    python experiments/sample_eval.py --run runs/molecules_v4 \
        --temperatures 0.6,0.7,0.85,1.0 --num_samples 1024

Writes a JSON line per temperature to stdout and the whole table to
``<run>/temperature_sweep.json``.
"""

import argparse
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from categoricalnf_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402

from categoricalnf_tpu.inference import load_run  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=str, required=True)
    ap.add_argument("--temperatures", type=str, default="0.7,0.85,1.0")
    ap.add_argument("--num_samples", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--best_of_k", type=int, default=1,
                    help="validity@k: count a graph valid if any of k "
                         "independent samples is (tasks that support it)")
    args = ap.parse_args()

    handle = load_run(args.run)
    sig = inspect.signature(handle.task.sample_metrics).parameters
    extra = {}
    if "num_samples" in sig:
        extra["num_samples"] = args.num_samples
    if args.best_of_k > 1 and "best_of_k" in sig:
        extra["best_of_k"] = args.best_of_k
    # A token is either a scalar "0.85" or a per-stage "t_node:t_exist:
    # t_bond" triple (GraphCNF stage temperatures; models/graphcnf.py
    # sample()).  Per-stage tokens require task support.
    def parse_temp(tok):
        parts = [float(x) for x in tok.split(":")]
        return parts[0] if len(parts) == 1 else tuple(parts)
    temps = [parse_temp(t) for t in args.temperatures.split(",")]
    if any(isinstance(t, tuple) for t in temps) and not getattr(
            handle.task, "supports_stage_temperatures", False):
        print(f"{handle.task.name}: no per-stage temperature support; "
              "dropping triple tokens", file=sys.stderr)
        temps = [t for t in temps if not isinstance(t, tuple)] or [1.0]
    if "temperature" not in sig and temps != [1.0]:
        print(f"{handle.task.name}: no temperature knob; evaluating T=1 "
              "only", file=sys.stderr)
        temps = [1.0]
    rows = []
    for i, t in enumerate(temps):
        rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        kw = dict(extra)
        if "temperature" in sig:
            kw["temperature"] = t
        metrics = handle.task.sample_metrics(handle.params, rng, **kw)
        row = {"temperature": list(t) if isinstance(t, tuple) else t,
               "step": handle.step,
               **({"num_samples": args.num_samples} if extra else {}),
               **{k: float(v) for k, v in metrics.items()}}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Write both the canonical latest file AND a step/size-suffixed
    # archive copy, so repeated invocations on the same run dir never
    # destroy quoted evidence (advisor r4: sweeps quoted in RESULTS.md
    # survived only in git history after later overwrites).
    out = os.path.join(args.run, "temperature_sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    suffixed = os.path.join(
        args.run,
        f"temperature_sweep_{rows[0]['step']}_{args.num_samples}.json")
    with open(suffixed, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out} and {suffixed}", file=sys.stderr)


if __name__ == "__main__":
    main()
