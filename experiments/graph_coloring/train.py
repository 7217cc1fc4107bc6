"""Graph coloring experiment CLI (reference parity:
``experiments/graph_coloring/train.py``, SURVEY.md C25/C27).

Example:
    python experiments/graph_coloring/train.py --num_steps 20000 \
        --out_dir runs/coloring
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from categoricalnf_tpu.tasks.graph_coloring import GraphColoringTask
from categoricalnf_tpu.utils.cli import default_parser, run_training


def main():
    p = default_parser("Graph 3-coloring with RGCN couplings")
    p.add_argument("--min_nodes", type=int, default=10)
    p.add_argument("--max_nodes", type=int, default=20)
    p.add_argument("--num_colors", type=int, default=3)
    p.add_argument("--edge_prob", type=float, default=0.25)
    p.set_defaults(batch_size=256, encoding_dim=2, num_layers=6)
    args = p.parse_args()
    task = GraphColoringTask(
        min_nodes=args.min_nodes, max_nodes=args.max_nodes,
        num_colors=args.num_colors, edge_prob=args.edge_prob,
        batch_size=args.batch_size, encoding_dim=args.encoding_dim,
        num_layers=args.num_layers, hidden_dim=args.hidden_dim,
        num_mixtures=args.num_mixtures, compute_dtype=args.compute_dtype)
    final = run_training(task, args)
    print(f"best bpd {final['best_bpd']:.4f} | "
          f"validity {final.get('coloring_validity', float('nan')):.3f}")


if __name__ == "__main__":
    main()
