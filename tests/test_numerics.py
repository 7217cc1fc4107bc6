"""Property + golden tests for the mixture-of-logistics core (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from categoricalnf_tpu.ops import numerics as nm


def _rand_mixture(rng, shape, K):
    k1, k2, k3 = jax.random.split(rng, 3)
    pi_logits = jax.random.normal(k1, shape + (K,))
    means = jax.random.normal(k2, shape + (K,)) * 2.0
    log_scales = jax.random.normal(k3, shape + (K,)) * 0.5 - 0.5
    return pi_logits, means, log_scales


def test_logistic_pdf_cdf_consistency(rng):
    x = jnp.linspace(-8, 8, 257)
    mean, ls = jnp.float32(0.3), jnp.float32(-0.2)
    # d/dx log CDF should equal exp(log_pdf - log_cdf)
    grad_logcdf = jax.vmap(jax.grad(lambda t: nm.logistic_log_cdf(t, mean, ls)))(x)
    expected = jnp.exp(nm.logistic_log_pdf(x, mean, ls) - nm.logistic_log_cdf(x, mean, ls))
    np.testing.assert_allclose(grad_logcdf, expected, rtol=1e-4, atol=1e-5)


def test_logistic_icdf_roundtrip(rng):
    p = jnp.linspace(0.001, 0.999, 101)
    x = nm.logistic_icdf(p, 1.5, 0.3)
    logp = nm.logistic_log_cdf(x, 1.5, 0.3)
    np.testing.assert_allclose(jnp.exp(logp), p, rtol=1e-4, atol=1e-4)


def test_mixture_ldj_matches_autodiff(rng):
    K = 5
    pi, mu, ls = _rand_mixture(rng, (), K)
    xs = jnp.linspace(-6, 6, 101)

    def fwd(x):
        y, _ = nm.mixture_logit_cdf_and_ldj(x, pi, mu, ls)
        return y

    grads = jax.vmap(jax.grad(fwd))(xs)
    _, ldj = nm.mixture_logit_cdf_and_ldj(xs, pi, mu, ls)
    np.testing.assert_allclose(jnp.log(grads), ldj, rtol=1e-3, atol=1e-3)


def test_mixture_inverse_roundtrip(rng):
    K = 8
    shape = (64, 16)
    pi, mu, ls = _rand_mixture(rng, shape, K)
    x = jax.random.normal(jax.random.fold_in(rng, 7), shape) * 3.0
    y, _ = nm.mixture_logit_cdf_and_ldj(x, pi, mu, ls)
    x_rec = nm.mixture_inverse_logit_cdf(y, pi, mu, ls)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=2e-5)


def test_mixture_inverse_extreme_tails(rng):
    """Bracketed bisection must stay exact far into the tails."""
    K = 4
    pi, mu, ls = _rand_mixture(rng, (), K)
    x = jnp.array([-25.0, -10.0, 0.0, 10.0, 25.0])
    y, _ = nm.mixture_logit_cdf_and_ldj(x, pi, mu, ls)
    x_rec = nm.mixture_inverse_logit_cdf(y, pi, mu, ls)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-3)


def test_mixture_logpdf_normalised(rng):
    """Trapezoid-integrate the pdf over a wide grid — should be ~1."""
    K = 6
    pi, mu, ls = _rand_mixture(rng, (), K)
    xs = jnp.linspace(-60, 60, 20001)
    pdf = jnp.exp(nm.mixture_log_pdf(xs, pi, mu, ls))
    integral = jnp.trapezoid(pdf, xs)
    assert abs(float(integral) - 1.0) < 1e-3


def test_against_torch_oracle(rng):
    """Golden numerics: element-wise check vs a hand-written torch oracle."""
    torch = pytest.importorskip("torch")
    K = 7
    shape = (32, 8)
    pi, mu, ls = _rand_mixture(rng, shape, K)
    x = jax.random.normal(jax.random.fold_in(rng, 3), shape) * 2.0

    y_jax, ldj_jax = nm.mixture_logit_cdf_and_ldj(x, pi, mu, ls)

    tx = torch.tensor(np.asarray(x), dtype=torch.float64)
    tpi = torch.tensor(np.asarray(pi), dtype=torch.float64)
    tmu = torch.tensor(np.asarray(mu), dtype=torch.float64)
    tls = torch.tensor(np.asarray(ls), dtype=torch.float64)

    log_pi = torch.log_softmax(tpi, dim=-1)
    z = (tx.unsqueeze(-1) - tmu) * torch.exp(-tls)
    log_cdf = torch.logsumexp(log_pi + torch.nn.functional.logsigmoid(z), dim=-1)
    log_sf = torch.logsumexp(log_pi + torch.nn.functional.logsigmoid(-z), dim=-1)
    comp_logpdf = -z - 2 * torch.nn.functional.softplus(-z) - tls
    log_pdf = torch.logsumexp(log_pi + comp_logpdf, dim=-1)
    y_t = (log_cdf - log_sf).numpy()
    ldj_t = (log_pdf - log_cdf - log_sf).numpy()

    np.testing.assert_allclose(np.asarray(y_jax), y_t, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ldj_jax), ldj_t, rtol=1e-3, atol=2e-4)


def test_log_sigmoid_pair_matches_two_calls():
    """The shared-softplus pair (log σ(z), log σ(-z)) must equal two
    direct log_sigmoid calls to fp32 roundoff across both tails — the
    identity log σ(-z) = log σ(z) − z is exact; only sub-resolution
    absorption in the far tail is tolerated (PERFORMANCE.md)."""
    z = jnp.asarray(np.concatenate([np.linspace(-80, 80, 2001),
                                    [-1e4, 1e4, 0.0]]), jnp.float32)
    p, n = nm._log_sigmoid_pair(z)
    assert np.allclose(p, jax.nn.log_sigmoid(z), atol=0, rtol=0)
    assert np.max(np.abs(np.asarray(n - jax.nn.log_sigmoid(-z)))) < 1e-5
    assert np.all(np.asarray(p) <= 0) and np.all(np.asarray(n) <= 0)


def test_log1mexp():
    x = jnp.array([-1e-4, -0.1, -1.0, -10.0, -40.0])
    expected = np.log1p(-np.exp(np.asarray(x, np.float64)))
    np.testing.assert_allclose(np.asarray(nm.log1mexp(x)), expected, rtol=1e-4)


def test_logistic_sample_moments(rng):
    s = nm.logistic_sample(rng, (200_000,), mean=2.0, log_scale=0.0)
    # Logistic(0,1) variance = pi^2/3
    assert abs(float(jnp.mean(s)) - 2.0) < 0.02
    assert abs(float(jnp.var(s)) - (np.pi ** 2) / 3) < 0.05


def test_iw_log_prob_chunked_equals_flat(rng):
    """IS-chain chunking (lax.map of vmapped chunks) must be numerically
    identical to the flat vmap — same keys, same order, same logsumexp."""
    import numpy as np
    from categoricalnf_tpu.tasks import SetShufflingTask
    task = SetShufflingTask(set_size=8, batch_size=16, encoding_dim=2,
                            num_layers=2, hidden_dim=32, num_mixtures=4,
                            compute_dtype="float32")
    params = task.init_params(rng)
    x = jnp.asarray(next(task.train_batches(np.random.default_rng(0)))["x"])
    m = task.model
    keys = jax.random.split(jax.random.PRNGKey(7), 32)
    flat = jax.vmap(lambda k: m.elbo(params, x, k)["elbo"])(keys)
    ref = jax.scipy.special.logsumexp(flat, axis=0) - jnp.log(32.0)
    got = m.iw_log_prob(params, x, jax.random.PRNGKey(7), 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
