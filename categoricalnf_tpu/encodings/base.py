"""Encoding protocol: categorical x  <->  continuous z.

Reference parity: the ``layers/categorical_encoding`` package (SURVEY.md
C10–C14).  An encoding owns

  - ``encode``:   sample z ~ q(z|x) and return per-batch log q(z|x),
  - ``log_decoder``: log p(x|z) (Bayes partition over categories, learned
    decoder, or deterministic rounding),
  - ``decode``:   map z back to the most likely categories (sampling path).

Shapes: x int32 ``[B, T]``; z float32 ``[B, T, D]``; log-probs ``[B]``
(masked sums over positions).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Encoding:
    num_categories: int = 0
    dim: int = 2  # continuous dims per categorical variable

    def init(self, rng: jax.Array) -> Any:
        raise NotImplementedError

    def encode(self, params, x: Array, rng: jax.Array, *,
               mask: Optional[Array] = None) -> tuple[Array, Array]:
        raise NotImplementedError

    def log_decoder(self, params, x: Array, z: Array, *,
                    mask: Optional[Array] = None) -> Array:
        raise NotImplementedError

    def decode(self, params, z: Array, *,
               mask: Optional[Array] = None) -> Array:
        raise NotImplementedError
