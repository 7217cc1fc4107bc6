"""Shared argparse front-end for the experiment CLIs.

Reference parity: ``get_default_train_arguments`` + per-experiment
``train.py`` flags (SURVEY.md C27).
"""

from __future__ import annotations

import argparse

from categoricalnf_tpu.training import (OptimizerConfig, ScheduleSpec,
                                        TrainConfig, Trainer)
from categoricalnf_tpu.utils.config import save_config, set_seed


def default_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    g = p.add_argument_group("training")
    g.add_argument("--num_steps", type=int, default=10000)
    g.add_argument("--eval_every", type=int, default=1000)
    g.add_argument("--eval_samples", type=int, default=8)
    g.add_argument("--batch_size", type=int, default=1024)
    g.add_argument("--lr", type=float, default=7.5e-4)
    g.add_argument("--grad_clip", type=float, default=100.0)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--out_dir", type=str, default=None)
    g.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in out_dir")
    g.add_argument("--log_every", type=int, default=100)
    g.add_argument("--beta_end", type=float, default=1.0)
    g.add_argument("--beta_warmup", type=int, default=2000)
    m = p.add_argument_group("model")
    m.add_argument("--encoding", type=str, default="mixture",
                   choices=["mixture", "linear_flows", "vardeq"])
    m.add_argument("--encoding_dim", type=int, default=4)
    m.add_argument("--num_layers", type=int, default=8)
    m.add_argument("--hidden_dim", type=int, default=96)
    m.add_argument("--num_mixtures", type=int, default=8)
    m.add_argument("--compute_dtype", type=str, default="bfloat16")
    return p


def train_config_from_args(args) -> TrainConfig:
    return TrainConfig(
        num_steps=args.num_steps,
        eval_every=args.eval_every,
        eval_samples=args.eval_samples,
        seed=args.seed,
        out_dir=args.out_dir,
        log_every=args.log_every,
        optimizer=OptimizerConfig(learning_rate=args.lr,
                                  grad_clip_norm=args.grad_clip),
        beta_schedule=ScheduleSpec(kind="sigmoid", start=0.5,
                                   end=args.beta_end,
                                   center=args.beta_warmup, rate=0.002),
    )


def run_training(task, args) -> dict:
    from categoricalnf_tpu.utils.jax_setup import setup_jax
    setup_jax()
    set_seed(args.seed)
    cfg = train_config_from_args(args)
    if args.out_dir:
        save_config(args.out_dir, {"args": vars(args), "task": task.name})
    trainer = Trainer(task, cfg)
    return trainer.train(resume=args.resume)
