"""Failure-mode diagnostics for a trained molecule run.

Sampled-validity numbers (tasks/molecules.py) say HOW OFTEN samples fail;
this tool says WHY: per-atom-type valence-excess histograms, fragment
counts, bond-order and atom marginals vs the training data.  The output
directs model work (e.g. "excess is concentrated on 3+ bonds at N" points
at the bond stage, "fragmentation without excess" at the edge-existence
stage).  Reference parity: the reference's RDKit error strings play this
role informally (SURVEY.md C26); here it is a structured report.

Usage:
    CNF_PLATFORM=cpu python benchmarks/molecule_diagnostics.py \
        --run runs/molecules_v5 --num_samples 128 [--temperature 1.0]

Prints a JSON report and writes <run>/diagnostics.json.
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
import numpy as np  # noqa: E402

from categoricalnf_tpu.inference import load_run  # noqa: E402
from categoricalnf_tpu.tasks import chem  # noqa: E402


def diagnose(atoms: np.ndarray, edges: np.ndarray, node_mask: np.ndarray,
             data_atoms=None, data_edges=None, data_mask=None) -> dict:
    """Structured failure-mode report over a batch of sampled graphs."""
    B, N = atoms.shape
    n_types = len(chem.ATOM_TYPES)
    excess_by_type = np.zeros(n_types)
    atoms_sampled = np.zeros(n_types)
    frag_hist: dict[int, int] = {}
    n_excess_atoms = 0
    n_frag_only = 0
    n_excess_only = 0
    n_both = 0
    bond_orders = np.zeros(4)  # 0..3
    for b in range(B):
        idx = np.where(node_mask[b] > 0)[0]
        a = atoms[b, idx]
        adj = chem.edges_to_dense(edges[b], N)[np.ix_(idx, idx)]
        val = adj.sum(1)
        maxv = chem.MAX_VALENCE_ARR[a]
        over = val > maxv
        n_excess_atoms += int(over.sum())
        np.add.at(excess_by_type, a[over], 1)
        np.add.at(atoms_sampled, a, 1)
        comps = len(np.unique(chem._components((adj > 0).astype(np.int64))))
        frag_hist[comps] = frag_hist.get(comps, 0) + 1
        has_excess = bool(over.any())
        fragged = comps > 1
        if has_excess and fragged:
            n_both += 1
        elif has_excess:
            n_excess_only += 1
        elif fragged:
            n_frag_only += 1
        iu = np.triu_indices(len(idx), 1)
        orders = adj[iu]
        np.add.at(bond_orders, np.clip(orders, 0, 3), 1)

    report = {
        "num_samples": B,
        "valid_valence_and_connected": float(
            1.0 - (n_both + n_excess_only + n_frag_only) / B),
        "fail_excess_only": n_excess_only / B,
        "fail_fragmented_only": n_frag_only / B,
        "fail_both": n_both / B,
        "mean_excess_atoms_per_sample": n_excess_atoms / B,
        "excess_rate_by_atom_type": {
            chem.ATOM_TYPES[i]: float(excess_by_type[i]
                                      / max(atoms_sampled[i], 1))
            for i in range(n_types) if atoms_sampled[i] > 0},
        "atom_marginal": {
            chem.ATOM_TYPES[i]: float(atoms_sampled[i]
                                      / max(atoms_sampled.sum(), 1))
            for i in range(n_types) if atoms_sampled[i] > 0},
        "fragment_count_hist": {str(k): v / B
                                for k, v in sorted(frag_hist.items())},
        "bond_order_marginal_nonzero": (
            bond_orders[1:] / max(bond_orders[1:].sum(), 1)).tolist(),
    }
    if data_atoms is not None:
        d = diagnose(data_atoms, data_edges, data_mask)
        report["data_atom_marginal"] = d["atom_marginal"]
        report["data_bond_order_marginal_nonzero"] = (
            d["bond_order_marginal_nonzero"])
        report["data_mean_atoms"] = float(data_mask.sum(1).mean())
    report["sampled_mean_atoms"] = float(node_mask.sum(1).mean())
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--num_samples", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=99)
    args = ap.parse_args()

    handle = load_run(args.run)
    task = handle.task
    atoms, edges, node_mask = task.sample_many(
        handle.params, jax.random.PRNGKey(args.seed), args.num_samples,
        args.temperature)
    d = task._slice(np.arange(min(2000, task._split)))
    report = diagnose(np.asarray(atoms), np.asarray(edges),
                      np.asarray(node_mask),
                      np.asarray(d["atoms"]), np.asarray(d["edges"]),
                      np.asarray(d["node_mask"]))
    report["step"] = handle.step
    report["temperature"] = args.temperature
    print(json.dumps(report, indent=1))
    with open(os.path.join(args.run, "diagnostics.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
