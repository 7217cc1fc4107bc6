"""Train state + optimizer construction.

Reference parity: optimizer/LR handling inside ``TrainTemplate``
(``general/train.py``, SURVEY.md C18) and the vendored RAdam
(``general/radam.py``, C20) — here ``optax.radam`` plus gradient clipping
and exponential LR decay, composed with ``optax.chain``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    name: str = "radam"
    learning_rate: float = 7.5e-4
    lr_decay_rate: float = 0.999975  # per-step exponential decay
    lr_min_factor: float = 0.1
    grad_clip_norm: float = 100.0
    weight_decay: float = 0.0
    warmup_steps: int = 0

    def build(self) -> optax.GradientTransformation:
        def lr_schedule(step):
            lr = self.learning_rate * jnp.maximum(
                self.lr_decay_rate ** step, self.lr_min_factor)
            if self.warmup_steps > 0:
                lr = lr * jnp.clip(step / self.warmup_steps, 0.0, 1.0)
            return lr

        if self.name == "radam":
            opt = optax.radam(learning_rate=lr_schedule)
        elif self.name == "adam":
            opt = optax.adam(learning_rate=lr_schedule)
        elif self.name == "adamw":
            opt = optax.adamw(learning_rate=lr_schedule,
                              weight_decay=self.weight_decay)
        elif self.name == "sgd":
            opt = optax.sgd(learning_rate=lr_schedule)
        else:
            raise ValueError(f"unknown optimizer {self.name!r}")
        return optax.chain(
            optax.clip_by_global_norm(self.grad_clip_norm), opt)
