"""Print the best temperature arm of a run's latest sweep as a CLI token.

Reads <run>/temperature_sweep.json (the canonical latest sweep written by
experiments/sample_eval.py), picks the row with the highest raw validity
(molecules: "validity"; coloring: "coloring_validity"), and prints the
temperature formatted back into sample_eval's token syntax — scalar
"0.85" or per-stage "0.85:0.85:0.4" — so campaign scripts can chain
  BEST=$(python benchmarks/pick_best_temp.py runs/molecules_v7)
without hand-copying grid results between stages.
"""

import json
import sys


def temp_token(t):
    if isinstance(t, (list, tuple)):
        return ":".join(f"{x:g}" for x in t)
    return f"{t:g}"


def main():
    run = sys.argv[1]
    rows = json.load(open(f"{run}/temperature_sweep.json"))
    keys = ("validity", "coloring_validity")
    key = next(k for k in keys if k in rows[0])
    best = max(rows, key=lambda r: r[key])
    print(temp_token(best["temperature"]))


if __name__ == "__main__":
    main()
