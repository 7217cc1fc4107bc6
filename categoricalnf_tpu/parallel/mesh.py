"""Device mesh + sharding layout for the whole framework.

The reference has NO distributed layer (SURVEY.md §2 parallelism census);
scaling is new scope from BASELINE.json.  Design (per SURVEY.md §5/§7):

  - a 2-axis mesh ``('data', 'sample')``: batch elements shard over
    ``data``; importance-sampling chains shard over ``sample``.  Model
    parameters are replicated (models are ≤ ~10M params — TP/PP are
    deliberate non-goals, but the axis layout leaves room: adding a
    ``model`` axis later only touches this module).
  - gradients reduce over ICI automatically: the train step is jitted with
    batch sharded and params replicated, so XLA inserts the psum.
  - multi-host: ``jax.distributed.initialize()`` gated by env vars.

Works identically on 1 chip, a v5e slice, or N virtual CPU devices
(tests set ``xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SAMPLE_AXIS = "sample"


def maybe_init_distributed() -> None:
    """Initialise multi-host JAX if the launcher provided coordinates."""
    if os.environ.get("CNF_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["CNF_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("CNF_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("CNF_PROCESS_ID", "0")),
        )


def create_mesh(num_data: Optional[int] = None, num_sample: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_sample
    assert num_data * num_sample == n, (
        f"mesh {num_data}x{num_sample} != {n} devices")
    arr = np.asarray(devices).reshape(num_data, num_sample)
    return Mesh(arr, (DATA_AXIS, SAMPLE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def sample_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[S, B, ...] arrays: IS chains over 'sample', batch over 'data'."""
    return NamedSharding(mesh, P(SAMPLE_AXIS, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a PyTree of [B, ...] arrays with B sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] multi-step batch stacks: steps replicated (the scan
    consumes them sequentially), batch over 'data'."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_stacked_batch(mesh: Mesh, batch):
    """Device-put a PyTree of [K, B, ...] stacks for steps_per_call > 1."""
    sh = stacked_batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
