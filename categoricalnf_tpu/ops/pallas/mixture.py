"""Pallas TPU kernels for the mixture-CDF hot paths (SURVEY.md §7.2).

The bisection inverse is the framework's sampling hot loop: ~45 fixed
iterations, each needing three logsumexps over the K mixture components.
Under plain XLA the loop carries [M] tensors while the [M, K] parameters
live in HBM — every iteration re-streams ~(3K+2)·4 bytes per element.
This kernel loads the parameters into VMEM ONCE and runs the entire
bisection + Newton polish on-chip, making the op compute-bound on the VPU
instead of HBM-bound.

Layout: components on the sublane axis, elements on the lane axis —
arrays are [K_pad, BM] float32 tiles (K_pad a multiple of 8, BM a multiple
of 128), so the K-reduction is a cheap sublane reduce.

Numerics are IDENTICAL to ``ops.numerics.mixture_inverse_logit_cdf``
(same bracket, same iteration counts) — property tests cross-check both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30  # effectively -inf for padded mixture components


def _logsumexp0(x):
    """logsumexp over axis 0 (sublanes), keepdims."""
    m = jnp.max(x, axis=0, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=0, keepdims=True))


def _log_sigmoid_pair(z):
    """(log_sigmoid(z), log_sigmoid(-z)) with ONE exp + ONE log1p."""
    sp = jnp.log1p(jnp.exp(-jnp.abs(z)))  # softplus(-|z|)
    lsp = jnp.where(z >= 0, -sp, z - sp)
    return lsp, lsp - z


def _inverse_kernel(y_ref, logpi_ref, mu_ref, nls_ref, out_ref, *,
                    num_iters: int):
    """Safeguarded Newton (rtsafe): Newton step with bracket fallback.

    Converges quadratically near the root but never worse than bisection —
    every iteration either takes a valid Newton step inside the bracket or
    falls back to the midpoint, and the bracket shrinks monotonically.
    ~18 iterations match 42 bisection + 3 Newton to fp32 accuracy at ~2.3x
    fewer transcendentals per iteration (shared-exp log-sigmoids).
    """
    y = y_ref[:]             # [1, BM]
    log_pi = logpi_ref[:]    # [K, BM]
    mu = mu_ref[:]           # [K, BM]
    neg_ls = nls_ref[:]      # [K, BM]  (= -log_scales, clipped)
    inv_s = jnp.exp(neg_ls)
    s = jnp.exp(-neg_ls)

    cand = mu + s * y        # [K, BM] exact bracket (see ops.numerics)
    live = log_pi > NEG_BIG * 0.5
    lo = jnp.min(jnp.where(live, cand, jnp.inf), axis=0, keepdims=True)
    hi = jnp.max(jnp.where(live, cand, -jnp.inf), axis=0, keepdims=True)

    def body(_, carry):
        x, lo, hi, dx_old = carry
        z = (x - mu) * inv_s
        lsp, lsn = _log_sigmoid_pair(z)
        log_cdf = _logsumexp0(log_pi + lsp)
        log_sf = _logsumexp0(log_pi + lsn)
        log_pdf = _logsumexp0(log_pi + lsp + lsn + neg_ls)
        g = log_cdf - log_sf - y
        lo = jnp.where(g < 0, x, lo)
        hi = jnp.where(g < 0, hi, x)
        step = g * jnp.exp(log_cdf + log_sf - log_pdf)
        nxt = x - step
        # Numerical-Recipes rtsafe safeguards: bisect when the candidate
        # leaves the bracket OR the step fails to halve the previous one
        # (kills the classic Newton two-cycle across the root).
        bad = jnp.logical_or(nxt <= lo, nxt >= hi)
        bad = jnp.logical_or(bad, 2.0 * jnp.abs(step) > dx_old)
        bad = jnp.logical_or(bad, jnp.logical_not(jnp.isfinite(nxt)))
        nxt = jnp.where(bad, 0.5 * (lo + hi), nxt)
        dx = jnp.where(bad, 0.5 * (hi - lo), jnp.abs(step))
        return nxt, lo, hi, dx

    x0 = 0.5 * (lo + hi)
    x, _, _, _ = jax.lax.fori_loop(0, num_iters, body,
                                   (x0, lo, hi, hi - lo))
    out_ref[:] = x


def _pad_to(x, m, axis, value=0.0):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("num_iters", "block_m",
                                             "interpret"))
def mixture_inverse_pallas(y, pi_logits, means, log_scales, *,
                           num_iters: int = 24,
                           block_m: int = 2048, interpret: bool = False):
    """Drop-in replacement for ``numerics.mixture_inverse_logit_cdf``.

    y: [...]; pi_logits/means/log_scales: [..., K].
    """
    from categoricalnf_tpu.ops import numerics as nm

    orig_shape = y.shape
    K = pi_logits.shape[-1]
    M = int(y.size)

    y_f = jnp.asarray(y, jnp.float32).reshape(1, M)
    log_pi = jax.nn.log_softmax(
        jnp.asarray(pi_logits, jnp.float32), axis=-1).reshape(M, K).T
    mu = jnp.asarray(means, jnp.float32).reshape(M, K).T
    nls = -jnp.clip(jnp.asarray(log_scales, jnp.float32),
                    nm.LOG_SCALE_MIN, nm.LOG_SCALE_MAX).reshape(M, K).T

    # pad lanes to block multiple, sublanes to 8.  bm must itself be a
    # multiple of 128 or Mosaic mis-tiles (ADVICE r1 low: M=300 under a
    # forced CNF_PALLAS=1 dispatch yielded a non-multiple lane block).
    bm = min(block_m, max(128, ((M + 127) // 128) * 128))
    y_f = _pad_to(y_f, bm, 1)
    log_pi = _pad_to(_pad_to(log_pi, bm, 1), 8, 0, value=NEG_BIG)
    mu = _pad_to(_pad_to(mu, bm, 1), 8, 0)
    nls = _pad_to(_pad_to(nls, bm, 1), 8, 0)
    Kp, Mp = log_pi.shape

    grid = (Mp // bm,)
    kernel = functools.partial(_inverse_kernel, num_iters=num_iters)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Mp), jnp.float32),
        interpret=interpret,
    )(y_f, log_pi, mu, nls)
    return out[0, :M].reshape(orig_shape)


def _forward_kernel(x_ref, logpi_ref, mu_ref, nls_ref, y_ref, ldj_ref):
    x = x_ref[:]
    log_pi = logpi_ref[:]
    mu = mu_ref[:]
    neg_ls = nls_ref[:]
    z = (x - mu) * jnp.exp(neg_ls)
    lsp = jax.nn.log_sigmoid(z)
    lsn = jax.nn.log_sigmoid(-z)
    log_cdf = _logsumexp0(log_pi + lsp)
    log_sf = _logsumexp0(log_pi + lsn)
    log_pdf = _logsumexp0(log_pi + lsp + lsn + neg_ls)
    y_ref[:] = log_cdf - log_sf
    ldj_ref[:] = log_pdf - log_cdf - log_sf


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def mixture_forward_pallas(x, pi_logits, means, log_scales, *,
                           block_m: int = 4096, interpret: bool = False):
    """Fused y = logit(F(x)) and ldj (cf. mixture_logit_cdf_and_ldj)."""
    from categoricalnf_tpu.ops import numerics as nm

    orig_shape = x.shape
    K = pi_logits.shape[-1]
    M = int(x.size)
    x_f = jnp.asarray(x, jnp.float32).reshape(1, M)
    log_pi = jax.nn.log_softmax(
        jnp.asarray(pi_logits, jnp.float32), axis=-1).reshape(M, K).T
    mu = jnp.asarray(means, jnp.float32).reshape(M, K).T
    nls = -jnp.clip(jnp.asarray(log_scales, jnp.float32),
                    nm.LOG_SCALE_MIN, nm.LOG_SCALE_MAX).reshape(M, K).T

    bm = min(block_m, max(128, ((M + 127) // 128) * 128))
    x_f = _pad_to(x_f, bm, 1)
    log_pi = _pad_to(_pad_to(log_pi, bm, 1), 8, 0, value=NEG_BIG)
    mu = _pad_to(_pad_to(mu, bm, 1), 8, 0)
    nls = _pad_to(_pad_to(nls, bm, 1), 8, 0)
    Kp, Mp = log_pi.shape

    y, ldj = pl.pallas_call(
        _forward_kernel,
        grid=(Mp // bm,),
        in_specs=[pl.BlockSpec((1, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((Kp, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((1, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, Mp), jnp.float32)] * 2,
        interpret=interpret,
    )(x_f, log_pi, mu, nls)
    return (y[0, :M].reshape(orig_shape), ldj[0, :M].reshape(orig_shape))
