"""Shared argparse front-end for the experiment CLIs.

Reference parity: ``get_default_train_arguments`` + per-experiment
``train.py`` flags (SURVEY.md C27).
"""

from __future__ import annotations

import argparse

from categoricalnf_tpu.training import (OptimizerConfig, ScheduleSpec,
                                        TrainConfig, Trainer)
from categoricalnf_tpu.utils.config import load_config, save_config, set_seed

# Architecture-defining CLI keys: resuming with a different value silently
# changes the learned function — some (edge_degree_norm, input_feats with
# equal widths, net gating flags) would NOT even fail the checkpoint-shape
# check, so they must be refused up front.
_ARCH_KEYS = frozenset({
    "encoding", "encoding_dim", "num_layers", "hidden_dim", "num_mixtures",
    "compute_dtype", "lstm_layers", "net", "input_feats", "seq_len",
    "corpus", "dataset", "max_nodes", "num_layers_node", "num_layers_edge",
    "num_layers_bond",
    "edge_degree_norm", "bond_cond_exist", "node_cond_atoms",
    "bond_cond_degree", "set_size", "num_colors", "min_nodes", "edge_prob",
    "decoder", "vardeq_blocks", "vardeq_hidden", "vardeq_mixtures",
})


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
    g.add_argument("--steps_per_call", type=int, default=1,
                   help="optimizer steps per device dispatch (lax.scan "
                   "over a stacked batch; amortizes tunnel round-trips — "
                   "bit-identical arithmetic to 1)")
    m = p.add_argument_group("model")
    m.add_argument("--encoding", type=str, default="mixture",
                   choices=["mixture", "linear_flows", "vardeq"])
    m.add_argument("--encoding_dim", type=int, default=4)
    m.add_argument("--num_layers", type=int, default=8)
    m.add_argument("--hidden_dim", type=int, default=96)
    m.add_argument("--num_mixtures", type=int, default=8)
    m.add_argument("--compute_dtype", type=str, default="bfloat16")
    m.add_argument("--decoder", type=str, default="bayes",
                   choices=["bayes", "linear", "mlp"],
                   help="mixture-encoding decoder: parameter-free Bayes "
                   "posterior (paper default) or the learned-decoder "
                   "ablation (SURVEY.md C13)")
    m.add_argument("--vardeq_blocks", type=int, default=2,
                   help="vardeq encoding: dequant-flow coupling blocks")
    m.add_argument("--vardeq_hidden", type=int, default=64,
                   help="vardeq encoding: dequant coupling-net width")
    m.add_argument("--vardeq_mixtures", type=int, default=4,
                   help="vardeq encoding: mixture components per coupling")
    return p


def train_config_from_args(args) -> TrainConfig:
    return TrainConfig(
        num_steps=args.num_steps,
        eval_every=args.eval_every,
        eval_samples=args.eval_samples,
        seed=args.seed,
        out_dir=args.out_dir,
        log_every=args.log_every,
        steps_per_call=getattr(args, "steps_per_call", 1),
        optimizer=OptimizerConfig(learning_rate=args.lr,
                                  grad_clip_norm=args.grad_clip),
        beta_schedule=ScheduleSpec(kind="sigmoid", start=0.5,
                                   end=args.beta_end,
                                   center=args.beta_warmup, rate=0.002),
    )


def check_resume_args(out_dir: str, args: dict, task=None) -> None:
    """Refuse a --resume whose architecture flags differ from the run's
    saved config (training knobs like lr/num_steps may change freely).

    A key MISSING from the saved config means the run predates the flag,
    i.e. it trained with that flag's default — so the comparison falls
    back to the task dataclass default (the single source of truth,
    matching ``inference.build_task``) rather than silently passing.
    """
    import dataclasses

    cfg = load_config(out_dir)
    if cfg is None:
        return
    saved = cfg.get("args", {})
    defaults = {}
    if task is not None and dataclasses.is_dataclass(task):
        from categoricalnf_tpu.inference import _ARG_RENAMES
        renames = {v: k for k, v in _ARG_RENAMES.items()}
        for f in dataclasses.fields(type(task)):
            if f.default is not dataclasses.MISSING:
                defaults[renames.get(f.name, f.name)] = f.default
    bad = {}
    for k in sorted(_ARCH_KEYS & set(args)):
        if k in saved:
            old = saved[k]
        elif k in defaults:
            old = defaults[k]
        else:
            continue
        if old != args[k]:
            bad[k] = (old, args[k])
    if bad:
        raise ValueError(
            f"--resume with changed architecture flags {bad} (saved vs "
            f"given) — this would silently alter the learned function; "
            f"start a fresh out_dir instead")


def run_training(task, args) -> dict:
    from categoricalnf_tpu.utils.jax_setup import setup_jax
    setup_jax()
    set_seed(args.seed)
    cfg = train_config_from_args(args)
    if args.out_dir:
        if args.resume:
            check_resume_args(args.out_dir, vars(args), task=task)
        save_config(args.out_dir, {"args": vars(args), "task": task.name})
    trainer = Trainer(task, cfg)
    return trainer.train(resume=args.resume)
