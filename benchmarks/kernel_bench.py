"""Profile the mixture-CDF hot paths: XLA vs Pallas on the TPU.

SURVEY.md §7.2: 'Ship XLA-jnp versions first; add Pallas fusions only
after profiling shows XLA fusion leaves throughput on the table —
measure, don't assume.'  This is the measurement.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from categoricalnf_tpu.ops import numerics as nm
from categoricalnf_tpu.ops.pallas.mixture import (mixture_forward_pallas,
                                                  mixture_inverse_pallas)
from categoricalnf_tpu.utils.timing import sync


def timeit(fn, xs, *rest, iters=20):
    """Honest tunnel timing (round-3 fixes):
    - ``xs`` is a POOL of distinct first-args, one per iteration — no two
      calls share all args, so the tunnel runtime's identical-arg replay
      cannot fire (it reported mfu 2.3 on the train bench);
    - the loop ends with a forced device->host read, because
      block_until_ready returns after ENQUEUE on the tunnel platform
      (utils/timing.sync)."""
    out = fn(xs[-1], *rest)
    sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(xs[i % len(xs)], *rest)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = jax.random.PRNGKey(0)
    n_pool = 8
    for M, K in [(1 << 18, 8), (1 << 20, 8), (1 << 20, 16), (1 << 22, 8)]:
        ks = jax.random.split(rng, 3 + n_pool)
        pi = jax.random.normal(ks[0], (M, K))
        mu = jax.random.normal(ks[1], (M, K)) * 2.0
        ls = jax.random.normal(ks[2], (M, K)) * 0.5 - 0.5
        xs = [jax.random.normal(k, (M,)) * 2.0 for k in ks[3:]]
        x = xs[0]
        ys = [nm.mixture_logit_cdf_and_ldj(xi, pi, mu, ls)[0] for xi in xs]
        y = ys[0]

        fwd_xla = jax.jit(nm.mixture_logit_cdf_and_ldj)
        inv_xla = jax.jit(functools.partial(nm.mixture_inverse_logit_cdf))

        t_fx = timeit(fwd_xla, xs, pi, mu, ls)
        t_fp = timeit(mixture_forward_pallas, xs, pi, mu, ls)
        t_ix = timeit(inv_xla, ys, pi, mu, ls, iters=5)
        t_ip = timeit(mixture_inverse_pallas, ys, pi, mu, ls, iters=5)

        bytes_fwd = M * 4 * (3 * K + 3)
        print(f"M=2^{M.bit_length()-1} K={K}:")
        print(f"  fwd  XLA {t_fx*1e3:7.3f} ms ({bytes_fwd/t_fx/1e9:6.1f} GB/s)"
              f"  Pallas {t_fp*1e3:7.3f} ms ({bytes_fwd/t_fp/1e9:6.1f} GB/s)"
              f"  speedup {t_fx/t_fp:5.2f}x")
        print(f"  inv  XLA {t_ix*1e3:7.3f} ms"
              f"  Pallas {t_ip*1e3:7.3f} ms  speedup {t_ix/t_ip:5.2f}x")

        # correctness on-device
        import numpy as np
        xp = mixture_inverse_pallas(y, pi, mu, ls)
        err = float(jnp.max(jnp.abs(xp - x)))
        print(f"  inverse max err vs truth: {err:.2e}")


def bench_fused_net():
    """Fused whole-SetTransformer kernel vs the XLA path, isolated from
    the rest of the train step (fwd and fwd+bwd at the flagship shape)."""
    from categoricalnf_tpu.networks.transformer import SetTransformer
    B, S, IN, OUT, H = 1024, 16, 4, 104, 96
    rng = jax.random.PRNGKey(0)
    nets = {
        "xla": SetTransformer(hidden_dim=H, num_heads=4, num_layers=2,
                              compute_dtype="bfloat16"),
        "fused": SetTransformer(hidden_dim=H, num_heads=4, num_layers=2,
                                compute_dtype="bfloat16", fused=True),
    }
    params = nets["xla"].init(rng, IN, OUT)
    xs = [jax.random.normal(k, (B, S, IN))
          for k in jax.random.split(rng, 8)]
    print(f"fused coupling-net kernel (B={B}, S={S}, H={H}, out={OUT}):")
    for name, net in nets.items():
        fwd = jax.jit(lambda x, n=net: n.apply(params, x))
        grad = jax.jit(jax.grad(
            lambda x, n=net: jnp.sum(n.apply(params, x)
                                     .astype(jnp.float32))))
        t_f = timeit(fwd, xs)
        t_g = timeit(grad, xs)
        print(f"  {name:5s}  fwd {t_f*1e3:7.3f} ms   fwd+bwd(x) "
              f"{t_g*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
    bench_fused_net()
