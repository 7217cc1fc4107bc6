"""Molecule generation experiment CLI: GraphCNF on Zinc250k/Moses
(reference parity: ``experiments/molecule_generation/train.py``,
SURVEY.md C26/C27).

Example:
    python experiments/molecule_generation/train.py --dataset zinc250k \
        --num_steps 50000 --out_dir runs/zinc
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from categoricalnf_tpu.tasks.molecules import MoleculeTask
from categoricalnf_tpu.utils.cli import default_parser, run_training


def main():
    p = default_parser("GraphCNF molecule generation")
    p.add_argument("--dataset", type=str, default="synthetic",
                   help="dataset name: looks for {name}.npz under "
                   "--data_dir / $CNF_DATA_DIR (zinc250k, moses, or any "
                   "preprocess.py output incl. --synthetic sets). A "
                   "missing .npz is an error for any name except "
                   "'synthetic' (the in-process random generator) — no "
                   "silent substitution")
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--max_nodes", type=int, default=38)
    p.add_argument("--num_layers_node", type=int, default=4)
    p.add_argument("--num_layers_edge", type=int, default=4)
    p.add_argument("--num_layers_bond", type=int, default=0,
                   help="bond-stage flow depth (0 = follow num_layers_edge)")
    p.add_argument("--edge_degree_norm", type=str, default="nodes",
                   choices=["nodes", "live_edges"],
                   help="EdgeGNN edge->node normaliser; live_edges scales "
                   "bond-stage messages by the live-bond degree")
    p.add_argument("--bond_cond_exist", action="store_true",
                   help="condition the bond stage on decoded existence "
                   "one-hots alongside z_e1")
    p.add_argument("--node_cond_atoms", action="store_true",
                   help="condition stages 2-3 on decoded atom-type "
                   "one-hots alongside z_v")
    p.add_argument("--bond_cond_degree", action="store_true",
                   help="condition the bond stage's node stream on the "
                   "decoded degree one-hot (the valence budget)")
    p.set_defaults(batch_size=64)
    args = p.parse_args()
    task = MoleculeTask(
        dataset=args.dataset, data_dir=args.data_dir,
        max_nodes=args.max_nodes, batch_size=args.batch_size,
        num_layers_node=args.num_layers_node,
        num_layers_edge=args.num_layers_edge,
        num_layers_bond=args.num_layers_bond,
        hidden_dim=args.hidden_dim, num_mixtures=args.num_mixtures,
        edge_degree_norm=args.edge_degree_norm,
        bond_cond_exist=args.bond_cond_exist,
        node_cond_atoms=args.node_cond_atoms,
        bond_cond_degree=args.bond_cond_degree,
        compute_dtype=args.compute_dtype)
    final = run_training(task, args)
    print(f"best bpd {final['best_bpd']:.4f} | "
          f"validity {final.get('validity', float('nan')):.3f} "
          f"(corrected {final.get('validity_corrected', float('nan')):.3f}) | "
          f"uniqueness {final.get('uniqueness', float('nan')):.3f} | "
          f"novelty {final.get('novelty', float('nan')):.3f}")


if __name__ == "__main__":
    main()
