"""Pallas kernels vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu.ops import numerics as nm
from categoricalnf_tpu.ops.pallas.mixture import (mixture_forward_pallas,
                                                  mixture_inverse_pallas)


def _mix(rng, shape, K):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return (jax.random.normal(k4, shape) * 2.0,
            jax.random.normal(k1, shape + (K,)),
            jax.random.normal(k2, shape + (K,)) * 2.0,
            jax.random.normal(k3, shape + (K,)) * 0.5 - 0.5)


def test_forward_kernel_matches_reference(rng):
    x, pi, mu, ls = _mix(rng, (32, 20), 8)
    y_ref, ldj_ref = nm.mixture_logit_cdf_and_ldj(x, pi, mu, ls)
    y, ldj = mixture_forward_pallas(x, pi, mu, ls, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(ldj_ref),
                               rtol=1e-5, atol=1e-5)


def test_inverse_kernel_matches_reference(rng):
    x, pi, mu, ls = _mix(rng, (16, 24), 5)
    y, _ = nm.mixture_logit_cdf_and_ldj(x, pi, mu, ls)
    x_ref = nm.mixture_inverse_logit_cdf(y, pi, mu, ls)
    x_pal = mixture_inverse_pallas(y, pi, mu, ls, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-4)
    # and it actually inverts
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x),
                               rtol=1e-3, atol=1e-3)


def test_inverse_kernel_newton_two_cycle_regression():
    """Parameters that made plain safeguarded Newton oscillate between the
    two sides of the root without shrinking the bracket (caught on TPU at
    M=2^20); the rtsafe step-halving rule must converge here."""
    pi = jnp.asarray([0.6, 1.614, 0.921, 1.032, 0.278, -1.363, 2.304, 0.68])
    mu = jnp.asarray([-1.708, 5.648, 0.566, -2.809, -0.082, 1.026, -2.156,
                      0.744])
    ls = jnp.asarray([-0.095, -1.146, -0.103, 0.93, -0.74, -0.958, -0.81,
                      -0.332])
    x_true = -2.456364393234253
    y = jnp.full((256,), -1.2907967567443848)
    P = jnp.broadcast_to(pi, (256, 8))
    MU = jnp.broadcast_to(mu, (256, 8))
    LS = jnp.broadcast_to(ls, (256, 8))
    xp = mixture_inverse_pallas(y, P, MU, LS, interpret=True)
    np.testing.assert_allclose(np.asarray(xp), x_true, rtol=1e-4, atol=1e-4)


def test_inverse_kernel_odd_sizes(rng):
    """Non-multiple-of-128 sizes and K not multiple of 8 must pad safely."""
    x, pi, mu, ls = _mix(rng, (7, 13), 3)
    y, _ = nm.mixture_logit_cdf_and_ldj(x, pi, mu, ls)
    x_pal = mixture_inverse_pallas(y, pi, mu, ls, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x),
                               rtol=1e-3, atol=1e-3)
