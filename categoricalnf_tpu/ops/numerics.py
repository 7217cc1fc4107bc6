"""Numerically-safe logistic / mixture-of-logistics primitives.

This is the mathematical core of the framework: every encoding and every
mixture-CDF coupling layer is built on these functions. All math here is
forced to float32 — TPU matmuls may run in bf16, but CDF/log-space math
must not (the bisection inverse needs the full fp32 mantissa to reach
~1e-6 reconstruction error).

Reference parity: the PyTorch reference keeps the same math spread across
``layers/flows/distributions.py`` and ``layers/flows/mixture_cdf_layer.py``
(see SURVEY.md C5/C8). Here it is centralised, expressed in pure log-space
(the transform output ``logit(F(x))`` is computed as ``log F - log (1-F)``
without ever materialising ``F``), which is both faster (fewer
transcendentals after XLA fusion) and far better conditioned in the tails.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Network outputs parameterising log-scales are clamped to this range before
# exponentiation.  The LOWER bound is a correctness constraint, not just an
# overflow guard: with activations bounded to |x| <= ~30 (flows.SoftClamp),
# fp32 resolves x to ~4e-6, and a component of scale >= exp(-5) ≈ 6.7e-3
# keeps z = (x-mu)/s resolvable to ~5e-4 — the computed CDF then really is
# the CDF of the computed map.  Narrower components let the optimizer mine
# the gap between claimed ldj and the actual fp32 map (observed: bits/dim
# → -300 with reconstruction error 1e12 before these bounds existed).
# The floor must stay BELOW the encoders' min sigma (mixture.py: 0.01) or
# the flow cannot match posterior sharpness and underfits by whole bits.
LOG_SCALE_MIN = -5.0
LOG_SCALE_MAX = 7.0


def _f32(x: Array) -> Array:
    return jnp.asarray(x, jnp.float32)


# ---------------------------------------------------------------------------
# Standard logistic distribution (loc/scale family)
# ---------------------------------------------------------------------------


def logistic_log_pdf(x: Array, mean: Array, log_scale: Array) -> Array:
    """log pdf of Logistic(mean, exp(log_scale)) at x.  All float32."""
    x, mean, log_scale = _f32(x), _f32(mean), _f32(log_scale)
    z = (x - mean) * jnp.exp(-log_scale)
    # log pdf = -z - 2*softplus(-z) - log_scale  (symmetric in z)
    return -z - 2.0 * jax.nn.softplus(-z) - log_scale


def logistic_log_cdf(x: Array, mean: Array, log_scale: Array) -> Array:
    z = (_f32(x) - _f32(mean)) * jnp.exp(-_f32(log_scale))
    return jax.nn.log_sigmoid(z)


def logistic_log_sf(x: Array, mean: Array, log_scale: Array) -> Array:
    """log survival function log(1 - CDF)."""
    z = (_f32(x) - _f32(mean)) * jnp.exp(-_f32(log_scale))
    return jax.nn.log_sigmoid(-z)


def logistic_icdf(p: Array, mean: Array, log_scale: Array) -> Array:
    p = _f32(p)
    return _f32(mean) + jnp.exp(_f32(log_scale)) * (jnp.log(p) - jnp.log1p(-p))


def logistic_sample(rng: jax.Array, shape, mean: Array = 0.0,
                    log_scale: Array = 0.0) -> Array:
    """Sample via inverse CDF of uniform; clipped away from {0,1}."""
    u = jax.random.uniform(rng, shape, dtype=jnp.float32,
                           minval=1e-6, maxval=1.0 - 1e-6)
    logit_u = jnp.log(u) - jnp.log1p(-u)
    return _f32(mean) + jnp.exp(_f32(log_scale)) * logit_u


# ---------------------------------------------------------------------------
# Mixture of logistics
#
# Parameterisation: pi_logits, means, log_scales all shaped [..., K] where
# the leading dims broadcast against the data x shaped [...].
# ---------------------------------------------------------------------------


def _mixture_z(x: Array, means: Array, log_scales: Array) -> Array:
    log_scales = jnp.clip(_f32(log_scales), LOG_SCALE_MIN, LOG_SCALE_MAX)
    return (_f32(x)[..., None] - _f32(means)) * jnp.exp(-log_scales)


def mixture_log_pdf(x: Array, pi_logits: Array, means: Array,
                    log_scales: Array) -> Array:
    log_pi = jax.nn.log_softmax(_f32(pi_logits), axis=-1)
    log_scales = jnp.clip(_f32(log_scales), LOG_SCALE_MIN, LOG_SCALE_MAX)
    z = _mixture_z(x, means, log_scales)
    comp = -z - 2.0 * jax.nn.softplus(-z) - log_scales
    return jax.scipy.special.logsumexp(log_pi + comp, axis=-1)


def mixture_log_cdf(x: Array, pi_logits: Array, means: Array,
                    log_scales: Array) -> Array:
    log_pi = jax.nn.log_softmax(_f32(pi_logits), axis=-1)
    z = _mixture_z(x, means, log_scales)
    return jax.scipy.special.logsumexp(log_pi + jax.nn.log_sigmoid(z), axis=-1)


def mixture_log_sf(x: Array, pi_logits: Array, means: Array,
                   log_scales: Array) -> Array:
    log_pi = jax.nn.log_softmax(_f32(pi_logits), axis=-1)
    z = _mixture_z(x, means, log_scales)
    _, log_sig_neg = _log_sigmoid_pair(z)
    return jax.scipy.special.logsumexp(log_pi + log_sig_neg, axis=-1)


def _log_sigmoid_pair(z: Array) -> tuple[Array, Array]:
    """(log sigmoid(z), log sigmoid(-z)) from ONE softplus via the exact
    identity log σ(-z) = log σ(z) - z.

    The mixture-CDF chain needs both tails of every component; computing
    them as two ``jax.nn.log_sigmoid`` calls costs two exp/log1p chains
    per element on the VPU (the flagship step's bottleneck per
    PERFORMANCE.md) unless XLA's CSE happens to fuse them.  The identity
    halves the transcendental count deterministically — same trick the
    Pallas kernel uses (ops/pallas/mixture.py "shared-exp pair").  Both
    tails keep full fp32 tail accuracy: for z→-∞ the subtraction
    reproduces the stable ``-log1p(exp(z))`` form to within fp32
    resolution of the dominant term.
    """
    log_sig_pos = jax.nn.log_sigmoid(z)
    return log_sig_pos, log_sig_pos - z


def mixture_logit_cdf_and_ldj(x: Array, pi_logits: Array, means: Array,
                              log_scales: Array) -> tuple[Array, Array]:
    """Fused evaluation of y = logit(F(x)) and its log-derivative.

    Returns ``(y, ldj)`` with ``y = log F(x) - log (1 - F(x))`` and
    ``ldj = log f(x) - log F(x) - log (1 - F(x))`` — the exact log-det of
    the map x -> logit(F(x)).  One pass computes all three logsumexps from
    shared component activations; XLA fuses this into a single kernel.
    """
    log_pi = jax.nn.log_softmax(_f32(pi_logits), axis=-1)
    log_scales = jnp.clip(_f32(log_scales), LOG_SCALE_MIN, LOG_SCALE_MAX)
    z = _mixture_z(x, means, log_scales)
    log_sig_pos, log_sig_neg = _log_sigmoid_pair(z)
    # logistic log pdf of each component = log_sig_pos + log_sig_neg - log_s
    lse = jax.scipy.special.logsumexp
    log_cdf = lse(log_pi + log_sig_pos, axis=-1)
    log_sf = lse(log_pi + log_sig_neg, axis=-1)
    log_pdf = lse(log_pi + log_sig_pos + log_sig_neg - log_scales, axis=-1)
    y = log_cdf - log_sf
    ldj = log_pdf - log_cdf - log_sf
    return y, ldj


def mixture_inverse_logit_cdf(y: Array, pi_logits: Array, means: Array,
                              log_scales: Array, *, num_bisect: int = 42,
                              num_newton: int = 3) -> Array:
    """Invert x -> logit(F(x)) by bracketed bisection + Newton polish.

    The root is bracketed exactly: if ``(x - mu_k)/s_k >= y`` for every
    component k then ``F(x) >= sigmoid(y)`` hence ``logit F(x) >= y`` (and
    symmetrically for the lower bound), so

        lo = min_k (mu_k + s_k * y),   hi = max_k (mu_k + s_k * y)

    is a guaranteed bracket.  ``num_bisect`` halvings shrink it by 2^-n,
    then ``num_newton`` Newton iterations (derivative available in closed
    form) polish to fp32 roundoff.  Everything is fixed-iteration,
    fixed-shape, vectorised over the full tensor — jit/pjit friendly and
    maps straight onto the TPU VPU.

    The reference implements this as a plain bisection loop in
    ``layers/flows/mixture_cdf_layer.py`` (SURVEY.md C5); the bracketing
    bound and Newton polish here are new.
    """
    y = _f32(y)
    log_pi = jax.nn.log_softmax(_f32(pi_logits), axis=-1)
    log_scales = jnp.clip(_f32(log_scales), LOG_SCALE_MIN, LOG_SCALE_MAX)
    means = _f32(means)
    scales = jnp.exp(log_scales)

    cand = means + scales * y[..., None]
    lo = jnp.min(cand, axis=-1)
    hi = jnp.max(cand, axis=-1)

    inv_scales = jnp.exp(-log_scales)

    def logit_cdf(x):
        z = (x[..., None] - means) * inv_scales
        lse = jax.scipy.special.logsumexp
        log_sig_pos, log_sig_neg = _log_sigmoid_pair(z)
        log_cdf = lse(log_pi + log_sig_pos, axis=-1)
        log_sf = lse(log_pi + log_sig_neg, axis=-1)
        return log_cdf - log_sf

    def bisect_body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        go_right = logit_cdf(mid) < y
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, num_bisect, bisect_body, (lo, hi))
    x = 0.5 * (lo + hi)

    def newton_body(_, x):
        z = x[..., None] - means
        z = z * inv_scales
        lse = jax.scipy.special.logsumexp
        log_sig_pos, log_sig_neg = _log_sigmoid_pair(z)
        log_cdf = lse(log_pi + log_sig_pos, axis=-1)
        log_sf = lse(log_pi + log_sig_neg, axis=-1)
        log_pdf = lse(log_pi + log_sig_pos + log_sig_neg - log_scales, axis=-1)
        f = log_cdf - log_sf - y
        # d/dx logit(F) = f(x) / (F (1-F)); step = -f / deriv
        step = f * jnp.exp(log_cdf + log_sf - log_pdf)
        # Stay inside the original bracket for safety.
        return jnp.clip(x - step, lo, hi)

    if num_newton > 0:
        x = jax.lax.fori_loop(0, num_newton, newton_body, x)
    return x


# ---------------------------------------------------------------------------
# Misc safe helpers
# ---------------------------------------------------------------------------


def safe_log(x: Array, eps: float = 1e-22) -> Array:
    return jnp.log(jnp.maximum(_f32(x), eps))


def log1mexp(x: Array) -> Array:
    """log(1 - exp(x)) for x < 0, numerically stable both near 0 and -inf."""
    x = _f32(x)
    return jnp.where(x > -0.6931472,  # log(2)
                     jnp.log(-jnp.expm1(x)),
                     jnp.log1p(-jnp.exp(x)))
