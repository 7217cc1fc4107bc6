"""Summarise runs/*/metrics.jsonl into a RESULTS.md table."""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))


def load_run(path):
    recs = []
    mp = os.path.join(path, "metrics.jsonl")
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        for line in f:
            recs.append(json.loads(line))
    return recs


def main(runs_dir="runs"):
    rows = []
    for name in sorted(os.listdir(runs_dir)):
        recs = load_run(os.path.join(runs_dir, name))
        if not recs:
            continue
        vals = [r for r in recs if r["prefix"] == "val"]
        finals = [r for r in recs if r["prefix"] == "final"]
        trains = [r for r in recs if r["prefix"] == "train"]
        tests = [r for r in recs if r["prefix"] == "test"]
        posthoc = [r for r in recs if r["prefix"] == "posthoc_test"]
        best = min((v["bpd"] for v in vals), default=float("nan"))
        gap = min((v.get("bpd_gap_to_optimum", float("nan")) for v in vals),
                  default=float("nan"))
        sps = (sorted(t.get("steps_per_s", 0) for t in trains)[len(trains) // 2]
               if trains else float("nan"))
        test_bpd = tests[-1]["test_bpd"] if tests else float("nan")
        # posthoc rows (eval_bpd CLI) are the tightest IW bound on record;
        # partial-split probes are excluded
        for p in posthoc:
            if p.get("partial"):
                continue
            if p["bpd"] < test_bpd or test_bpd != test_bpd:
                test_bpd = p["bpd"]
        extra = {}
        for f in finals:
            for k in ("coloring_validity", "validity", "validity_strict",
                      "validity_corrected", "uniqueness", "novelty"):
                if k in f:
                    extra[k] = f[k]
        alarm = any(r.get("integrity_alarm", 0) for r in vals + finals)
        # A preempted final means the run stopped early (SIGTERM/timeout):
        # its numbers are a waypoint at final["step"], not convergence.
        if finals and finals[-1].get("preempted"):
            extra["preempted_at"] = float(finals[-1]["step"])
        rows.append((name, best, gap, test_bpd, sps, extra, alarm))
    print("| run | best val bpd | gap to optimum | test bpd | steps/s "
          "| sample metrics |")
    print("|---|---|---|---|---|---|")
    for name, best, gap, test_bpd, sps, extra, alarm in rows:
        ex = ", ".join(f"{k}={v:.3f}" for k, v in extra.items()) or "—"
        if alarm:
            ex = "⚠ INTEGRITY ALARM; " + ex
        print(f"| {name} | {best:.4f} | {gap:+.4f} | {test_bpd:.4f} "
              f"| {sps:.0f} | {ex} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs")
