"""Preprocess a SMILES file into the molecule-task ``{name}.npz`` schema.

Reference parity: the dataset preprocessing inside
``experiments/molecule_generation/`` (SURVEY.md C26) — SMILES -> padded
graph tensors.  Output arrays (see ``tasks/molecules.py``):

  atoms      [M, max_nodes]  int8   atom-type ids (chem.ATOM_TYPES order)
  edges      [M, E]          int8   upper-tri bond orders (0 = no bond)
  num_atoms  [M]             int16  heavy-atom counts

Usage:
    python experiments/molecule_generation/preprocess.py \
        --input zinc250k.smi --name zinc250k --out_dir $CNF_DATA_DIR \
        --max_nodes 38

Input: one SMILES per line; lines may carry extra whitespace-separated
columns (ids) which are ignored; a leading header line containing
"smiles" is skipped.  Molecules that fail to parse/kekulize, exceed
``max_nodes``, or are disconnected are counted and dropped (stats printed
at the end).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

from categoricalnf_tpu.data.smiles import smiles_to_graph
from categoricalnf_tpu.tasks import chem


def preprocess(lines, max_nodes: int):
    atoms_out, edges_out, counts = [], [], []
    stats = {"total": 0, "parse_fail": 0, "too_large": 0,
             "disconnected": 0, "kept": 0}
    E = max_nodes * (max_nodes - 1) // 2
    for line in lines:
        s = line.split()[0] if line.split() else ""
        if not s or s.lower() == "smiles":
            continue
        stats["total"] += 1
        g = smiles_to_graph(s)
        if g is None:
            stats["parse_fail"] += 1
            continue
        ids, adj = g
        n = len(ids)
        if n > max_nodes:
            stats["too_large"] += 1
            continue
        if n > 1 and not chem._connected(adj):
            stats["disconnected"] += 1
            continue
        a = np.zeros(max_nodes, np.int8)
        a[:n] = ids
        full = np.zeros((max_nodes, max_nodes), np.int64)
        full[:n, :n] = adj
        e = chem.dense_to_edges(full).astype(np.int8)
        assert e.shape == (E,)
        atoms_out.append(a)
        edges_out.append(e)
        counts.append(n)
        stats["kept"] += 1
    return (np.stack(atoms_out) if atoms_out else
            np.zeros((0, max_nodes), np.int8),
            np.stack(edges_out) if edges_out else np.zeros((0, E), np.int8),
            np.asarray(counts, np.int16), stats)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help=".smi / .txt SMILES file")
    p.add_argument("--name", required=True,
                   help="dataset name (output file {name}.npz)")
    p.add_argument("--out_dir", default=os.environ.get("CNF_DATA_DIR",
                                                       "data"))
    p.add_argument("--max_nodes", type=int, default=38)
    args = p.parse_args()

    with open(args.input) as f:
        atoms, edges, num_atoms, stats = preprocess(f, args.max_nodes)

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"{args.name}.npz")
    np.savez_compressed(out, atoms=atoms, edges=edges, num_atoms=num_atoms)
    print(f"wrote {out}: {stats}")


if __name__ == "__main__":
    main()
