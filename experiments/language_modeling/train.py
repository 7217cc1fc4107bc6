"""Character-level LM experiment CLI: PTB / text8 (reference parity:
``experiments/language_modeling/train.py``, SURVEY.md C24/C27).

Example:
    python experiments/language_modeling/train.py --corpus ptb \
        --num_steps 50000 --out_dir runs/ptb
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import jax

from categoricalnf_tpu.tasks import LanguageModelingTask
from categoricalnf_tpu.utils.cli import default_parser, run_training


def main():
    p = default_parser("Character-level language modeling")
    p.add_argument("--corpus", type=str, default="ptb",
                   choices=["ptb", "text8", "synthetic"])
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--seq_len", type=int, default=256)
    p.add_argument("--lstm_layers", type=int, default=2,
                   help="depth of the causal backbone (LSTM or transformer)")
    p.add_argument("--net", type=str, default="lstm",
                   choices=["lstm", "transformer"],
                   help="causal coupling backbone (transformer = "
                   "scan-free attention training pass, KV-cache sampling)")
    p.add_argument("--input_feats", type=int, default=0,
                   help="V-component soft-classifier features of z_{t-1} "
                   "fed to the causal nets (0 = off; natural V = vocab)")
    p.add_argument("--prior", type=str, default="logistic",
                   choices=["logistic", "gaussian", "hmm"],
                   help="top-of-flow prior; 'hmm' = learned latent "
                   "state-space prior (see flows.HMMPrior)")
    p.add_argument("--prior_states", type=int, default=32)
    p.set_defaults(batch_size=128, encoding_dim=3, num_layers=2,
                   hidden_dim=512, num_mixtures=16)
    args = p.parse_args()
    task = LanguageModelingTask(
        corpus_name=args.corpus, data_dir=args.data_dir,
        seq_len=args.seq_len, batch_size=args.batch_size,
        encoding_name=args.encoding, encoding_dim=args.encoding_dim,
        num_layers=args.num_layers, hidden_dim=args.hidden_dim,
        lstm_layers=args.lstm_layers, num_mixtures=args.num_mixtures,
        net=args.net, input_feats=args.input_feats,
        prior=args.prior, prior_states=args.prior_states,
        compute_dtype=args.compute_dtype)
    final = run_training(task, args)
    opt = task.analytic_optimum_bpd()
    extra = f" | analytic optimum {opt:.4f}" if opt else ""
    print(f"best {final['best_bpd']:.4f} bits/char{extra}")


if __name__ == "__main__":
    main()
