"""Scalar parameter schedules (β-annealing, LR decay).

Reference parity: ``ParameterScheduler`` factories in
``general/parameter_scheduler.py`` (SURVEY.md C21).  Pure functions of the
step counter — usable both host-side and inside jitted train steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def constant(value: float) -> Schedule:
    def fn(step):
        return jnp.full((), value, jnp.float32)
    return fn


def linear(start: float, end: float, num_steps: int,
           delay: int = 0) -> Schedule:
    def fn(step):
        t = jnp.clip((step - delay) / max(num_steps, 1), 0.0, 1.0)
        return jnp.float32(start + (end - start) * t)
    return fn


def sigmoid_anneal(start: float, end: float, center: int,
                   rate: float = 0.01) -> Schedule:
    """Smooth start→end transition centered at ``center`` steps."""
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        frac = 1.0 / (1.0 + jnp.exp(-rate * (s - center)))
        return jnp.float32(start + (end - start) * frac)
    return fn


def exponential_decay(init: float, decay_rate: float, decay_steps: int,
                      staircase: bool = False,
                      min_value: float = 0.0) -> Schedule:
    def fn(step):
        p = jnp.asarray(step, jnp.float32) / max(decay_steps, 1)
        if staircase:
            p = jnp.floor(p)
        return jnp.maximum(jnp.float32(init * (decay_rate ** p)), min_value)
    return fn


@dataclasses.dataclass(frozen=True)
class ScheduleSpec:
    """Config-friendly schedule description."""

    kind: str = "constant"
    value: float = 1.0
    start: float = 0.0
    end: float = 1.0
    num_steps: int = 1000
    delay: int = 0
    center: int = 1000
    rate: float = 0.01
    decay_rate: float = 0.5
    decay_steps: int = 10000

    def build(self) -> Schedule:
        if self.kind == "constant":
            return constant(self.value)
        if self.kind == "linear":
            return linear(self.start, self.end, self.num_steps, self.delay)
        if self.kind == "sigmoid":
            return sigmoid_anneal(self.start, self.end, self.center, self.rate)
        if self.kind == "exponential":
            return exponential_decay(self.value, self.decay_rate,
                                     self.decay_steps)
        raise ValueError(f"unknown schedule kind {self.kind!r}")
