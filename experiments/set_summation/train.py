"""Set summation experiment CLI — the mixture-vs-vardeq ablation task
(reference parity: ``experiments/set_modeling/``, SURVEY.md C23/C27).

Example (ablation):
    python experiments/set_summation/train.py --encoding mixture
    python experiments/set_summation/train.py --encoding vardeq
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from categoricalnf_tpu.tasks import SetSummationTask
from categoricalnf_tpu.utils.cli import default_parser, run_training


def main():
    p = default_parser("Set summation: sum-constrained sequences")
    p.add_argument("--set_size", type=int, default=16)
    p.add_argument("--num_categories", type=int, default=10)
    p.add_argument("--target_sum", type=int, default=0)
    args = p.parse_args()
    task = SetSummationTask(
        set_size=args.set_size, num_categories=args.num_categories,
        target_sum=args.target_sum, batch_size=args.batch_size,
        encoding_name=args.encoding, encoding_dim=args.encoding_dim,
        num_layers=args.num_layers, hidden_dim=args.hidden_dim,
        num_mixtures=args.num_mixtures, compute_dtype=args.compute_dtype,
        decoder=args.decoder, vardeq_blocks=args.vardeq_blocks,
        vardeq_hidden=args.vardeq_hidden,
        vardeq_mixtures=args.vardeq_mixtures)
    final = run_training(task, args)
    print(f"optimum {task.analytic_optimum_bpd():.4f} bits/var | "
          f"best {final['best_bpd']:.4f}")


if __name__ == "__main__":
    main()
