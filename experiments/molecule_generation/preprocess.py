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


def synthesize_smiles(num: int, max_nodes: int, seed: int,
                      style: str = "zinc_like") -> list:
    """Generate N synthetic valid molecules and render them as SMILES.

    Zero-egress stand-in for Zinc250k (SURVEY.md §7 hard part 6).
    ``zinc_like`` uses the structured motif grammar
    (``chem.zinc_like_molecule`` — drug-like rings/chains/decorations);
    ``uniform`` keeps the old near-max-entropy tree+ring generator for
    ablation.  The molecules are rendered to SMILES so the synthetic
    corpus flows through the exact same ingestion path as a real ``.smi``
    file (parser + kekulizer exercised end-to-end on the full corpus).
    """
    from categoricalnf_tpu.data.smiles import graph_to_smiles
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        n = int(rng.integers(8, max_nodes + 1))
        if style == "zinc_like":
            a, adj = chem.zinc_like_molecule(rng, n)
        elif style == "moses_like":
            a, adj = chem.zinc_like_molecule(rng, n, leaf_style="moses")
        else:
            a, adj = chem.random_molecule(rng, n)
        out.append(graph_to_smiles(a, adj))
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default=None, help=".smi / .txt SMILES file")
    p.add_argument("--synthetic", type=int, default=0,
                   help="instead of --input, generate N synthetic "
                   "valence-correct molecules (zero-egress stand-in)")
    p.add_argument("--style", choices=["zinc_like", "moses_like", "uniform"],
                   default="zinc_like",
                   help="synthetic generator: structured drug-like motifs "
                   "(default), the Moses-composition variant (Br leaves, "
                   "BASELINE Moses row), or the legacy uniform tree+ring "
                   "graphs")
    p.add_argument("--name", required=True,
                   help="dataset name (output file {name}.npz)")
    p.add_argument("--out_dir", default=os.environ.get("CNF_DATA_DIR",
                                                       "data"))
    p.add_argument("--max_nodes", type=int, default=38)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if bool(args.input) == bool(args.synthetic):
        p.error("exactly one of --input / --synthetic is required")
    if args.synthetic:
        # Materialize a .smi corpus, then ingest it through the same
        # SMILES path a real file takes (writer+parser roundtrip on the
        # whole corpus is itself a test of the ingestion machinery).
        os.makedirs(args.out_dir, exist_ok=True)
        smi_path = os.path.join(args.out_dir, f"{args.name}.smi")
        smi = synthesize_smiles(args.synthetic, args.max_nodes, args.seed,
                                args.style)
        with open(smi_path, "w") as f:
            f.write("\n".join(smi) + "\n")
        print(f"wrote {smi_path} ({len(smi)} molecules, {args.style})")
        atoms, edges, num_atoms, stats = preprocess(smi, args.max_nodes)
        stats["synthetic"] = args.style
        assert stats["kept"] == args.synthetic, stats   # lossless roundtrip
    else:
        with open(args.input) as f:
            atoms, edges, num_atoms, stats = preprocess(f, args.max_nodes)

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"{args.name}.npz")
    np.savez_compressed(out, atoms=atoms, edges=edges, num_atoms=num_atoms)
    print(f"wrote {out}: {stats}")


if __name__ == "__main__":
    main()
