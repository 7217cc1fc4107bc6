"""Sharded importance-sampled evaluation + sampling throughput helpers.

BASELINE.json scope (not in the reference): IS chains shard over the
mesh's ``sample`` axis while the batch shards over ``data``; the final
logsumexp over chains is an XLA collective over ICI.  The same helper
also serves the scaling-efficiency report (samples/s at 1 chip vs N).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from categoricalnf_tpu.parallel import mesh as mesh_lib


def make_sharded_iw_eval(model, mesh):
    """Returns eval_fn(params, x, rng, num_samples, mask) -> bpd [B].

    Keys for the S chains are sharded over the ``sample`` axis, the batch
    over ``data``; each device computes its (S/s_mesh, B/d_mesh) block of
    ELBOs and the logsumexp reduction over chains runs as a collective.
    """
    key_sh = NamedSharding(mesh, P(mesh_lib.SAMPLE_AXIS))
    data_sh = mesh_lib.batch_sharding(mesh)

    @jax.jit
    def _eval(params, x, keys, mask):
        def one(key):
            return model.elbo(params, x, key, mask=mask)["elbo"]

        elbos = jax.vmap(one)(keys)  # [S, B]
        ll = (jax.scipy.special.logsumexp(elbos, axis=0)
              - jnp.log(jnp.float32(elbos.shape[0])))
        if mask is None:
            n = jnp.full((x.shape[0],), float(x.shape[1]), jnp.float32)
        else:
            n = jnp.asarray(mask, jnp.float32).sum(axis=1)
        return -ll / (n * 0.6931471805599453)

    def eval_fn(params, x, rng, num_samples: int, mask=None):
        keys = jax.random.split(rng, num_samples)
        keys = jax.device_put(keys, key_sh)
        x = jax.device_put(x, data_sh)
        if mask is not None:
            mask = jax.device_put(mask, data_sh)
        return _eval(params, x, keys, mask)

    return eval_fn


def make_task_sharded_iw_eval(task, mesh):
    """Task-generic variant used by the Trainer (VERDICT r1 #8): shards IS
    chains over ``sample`` and the batch over ``data`` for ANY task that
    implements the ``elbo``/``num_vars``/``eval_bpd_extra`` hooks
    (training/task.py).  Returns eval_fn(params, batch, rng, num_samples)
    -> per-example bpd [B]; equals ``task.eval_step`` up to fp noise.
    """
    key_sh = NamedSharding(mesh, P(mesh_lib.SAMPLE_AXIS))
    s_size = mesh.shape[mesh_lib.SAMPLE_AXIS]

    @jax.jit
    def _eval(params, batch, keys):
        elbos = jax.vmap(lambda k: task.elbo(params, batch, k))(keys)
        ll = (jax.scipy.special.logsumexp(elbos, axis=0)
              - jnp.log(jnp.float32(elbos.shape[0])))
        bpd = -ll / (task.num_vars(batch) * 0.6931471805599453)
        return bpd + task.eval_bpd_extra(batch)

    def effective_num_samples(num_samples: int) -> int:
        """IS chain count actually evaluated: rounded UP to tile the
        sample axis.  Callers logging an IS count must log THIS, or the
        recorded bound looks tighter than its sample count implies."""
        return ((num_samples + s_size - 1) // s_size) * s_size

    def eval_fn(params, batch, rng, num_samples: int):
        num = effective_num_samples(num_samples)
        keys = jax.device_put(jax.random.split(rng, num), key_sh)
        batch = mesh_lib.shard_batch(mesh, batch)
        return _eval(params, batch, keys)

    eval_fn.effective_num_samples = effective_num_samples
    return eval_fn
