"""Honest wall-clock timing on the axon TPU tunnel.

``jax.block_until_ready`` is NOT a sync barrier on the tunnel platform:
it returns once the call is enqueued, not once the chip has executed it.
Measured consequence (round 3): the K=8 multi-step bench "measured"
394-459 TFLOP/s on a 197 TFLOP/s v5e (mfu 2.0-2.3).  A device->host
VALUE read cannot lie — the bytes only exist once the device (which
executes its stream in order) has drained every previously enqueued
call.  Every TPU timing loop in this repo must end with :func:`sync`.
"""

from __future__ import annotations

import jax


def sync(tree) -> float:
    """Force real completion of all enqueued work; returns one value.

    Reads a single scalar from the first leaf (a tiny on-device slice,
    then a 4-byte transfer) so the sync itself adds microseconds even
    when the result is a multi-MB tensor.
    """
    leaf = jax.tree.leaves(tree)[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    return float(leaf[idx]) if idx else float(leaf)
