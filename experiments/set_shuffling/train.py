"""Set shuffling experiment CLI (reference parity:
``experiments/set_modeling/train.py``, SURVEY.md C23/C27).

Example:
    python experiments/set_shuffling/train.py --num_steps 5000 \
        --out_dir runs/set_shuffling
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from categoricalnf_tpu.tasks import SetShufflingTask
from categoricalnf_tpu.utils.cli import default_parser, run_training


def main():
    p = default_parser("Set shuffling: uniform over permutations")
    p.add_argument("--set_size", type=int, default=16)
    # Execution-schedule knobs (non-architecture: resume-compatible).
    # remat: +19.3% on the memory-bound step (PERFORMANCE.md round 4,
    # gradient-equivalence-tested).  fused: whole-coupling-net Pallas
    # kernel (tests pin parity to 2e-4).
    p.add_argument("--remat", action="store_true")
    p.add_argument("--fused", action="store_true")
    args = p.parse_args()
    task = SetShufflingTask(
        set_size=args.set_size, batch_size=args.batch_size,
        encoding_name=args.encoding, encoding_dim=args.encoding_dim,
        num_layers=args.num_layers, hidden_dim=args.hidden_dim,
        num_mixtures=args.num_mixtures, compute_dtype=args.compute_dtype,
        decoder=args.decoder, vardeq_blocks=args.vardeq_blocks,
        vardeq_hidden=args.vardeq_hidden,
        vardeq_mixtures=args.vardeq_mixtures,
        remat=args.remat, fused=args.fused)
    final = run_training(task, args)
    print(f"optimum {task.analytic_optimum_bpd():.4f} bits/var | "
          f"best {final['best_bpd']:.4f}")


if __name__ == "__main__":
    main()
