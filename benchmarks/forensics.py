"""Layer-wise forensic analysis of a trained set-shuffling checkpoint.

Used to localise fp32 ldj-exploitation: walks the flow layer by layer at
the TRAINED parameters and reports, per layer: activation range, ldj
contribution, and per-layer inverse reconstruction error.  The layer where
claimed ldj and actual (numerically invertible) behaviour diverge is the
crack.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from categoricalnf_tpu.flows.scanned import ScannedBlocks, _slice_d
from categoricalnf_tpu.tasks import SetShufflingTask


def main(run_dir="runs/set16"):
    task = SetShufflingTask(set_size=16, batch_size=64, encoding_dim=4,
                            num_layers=8, hidden_dim=96, num_mixtures=8,
                            compute_dtype="bfloat16")
    ckptr = ocp.StandardCheckpointer()
    d = sorted(os.listdir(f"{run_dir}/checkpoints"))[-1]
    restored = ckptr.restore(os.path.abspath(f"{run_dir}/checkpoints/{d}"))
    params = restored["params"]
    print("step", restored["step"])

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(next(task.train_batches(np.random.default_rng(0)))["x"])[:64]
    enc = task.model.encoding
    z, log_q = enc.encode(params["encoding"], x, rng)
    print(f"log_q/ex {float(log_q.mean()):9.2f}   z in "
          f"[{float(z.min()):+.2f}, {float(z.max()):+.2f}]")

    flow = task.model.flow
    fp, prior_params = flow._split(params["flow"])
    if isinstance(flow.layers[0], ScannedBlocks) and len(fp) == 1:
        scanned = flow.layers[0]
        sp = fp[0] if isinstance(fp, (list, tuple)) else fp["0"]
        pairs = []
        for dep in range(scanned.depth):
            for li, layer in enumerate(scanned.block):
                stack = sp[li] if isinstance(sp, (list, tuple)) else sp[str(li)]
                pairs.append((f"d{dep}", layer, _slice_d(stack, dep)))
    else:
        from categoricalnf_tpu.tasks.set_modeling import build_set_flow
        unrolled = build_set_flow(task.encoding_dim, task.num_layers,
                                  task.hidden_dim,
                                  num_mixtures=task.num_mixtures,
                                  compute_dtype=task.compute_dtype,
                                  scan_blocks=False)
        pairs = [(f"l{i}", layer,
                  fp[i] if isinstance(fp, (list, tuple)) else fp[str(i)])
                 for i, layer in enumerate(unrolled.layers)]

    total_ldj = jnp.zeros(z.shape[0], jnp.float32)
    cur = z
    for tag, layer, p in pairs:
        ldj0 = jnp.zeros(cur.shape[0], jnp.float32)
        nxt, ldj = layer.forward(p, cur, ldj0)
        rec, _ = layer.inverse(p, nxt, ldj)
        err = float(jnp.abs(rec - cur).max())
        name = type(layer).__name__
        print(f"{tag} {name:22s} ldj/ex {float(ldj.mean()):9.2f}  "
              f"out [{float(nxt.min()):+8.2f},{float(nxt.max()):+8.2f}]"
              f"  inv_err {err:.2e}")
        total_ldj += ldj
        cur = nxt
    lp_prior = (flow.prior.log_prob(prior_params, cur)
                if prior_params is not None else flow.prior.log_prob(cur))
    print(f"total ldj/ex {float(total_ldj.mean()):.2f}  prior/ex "
          f"{float(lp_prior.mean()):.2f}")
    elbo = lp_prior + total_ldj - log_q
    dec = enc.log_decoder(params["encoding"], x, z)
    print(f"log_dec/ex {float(dec.mean()):.2f}  ELBO/ex "
          f"{float((elbo + dec).mean()):.2f} (must be <= -30.7 for optimum)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/set16")
