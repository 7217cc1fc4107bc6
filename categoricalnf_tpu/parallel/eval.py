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
