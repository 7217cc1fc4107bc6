"""SoftClamp bijection + anti-cheat integration tests."""

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu import flows


def test_softclamp_roundtrip_and_ldj(rng):
    layer = flows.SoftClamp(cap=30.0)
    params = layer.init(rng, 4)
    z = jax.random.normal(rng, (4, 5, 4)) * 10.0
    ldj0 = jnp.zeros(4, jnp.float32)
    zf, ldj = layer.forward(params, z, ldj0)
    assert float(jnp.abs(zf).max()) < 30.0
    zr, ldj_r = layer.inverse(params, zf, ldj)
    np.testing.assert_allclose(np.asarray(zr), np.asarray(z), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj_r), 0.0, atol=1e-3)


def test_softclamp_ldj_matches_autodiff(rng):
    layer = flows.SoftClamp(cap=7.0)
    params = layer.init(rng, 1)

    def fwd(x):
        z = x.reshape(1, 1, 1)
        out, ldj = layer.forward(params, z, jnp.zeros(1, jnp.float32))
        return out.reshape(()), ldj[0]

    for v in [-20.0, -3.0, 0.0, 1.5, 15.0]:
        g = jax.grad(lambda x: fwd(x)[0])(jnp.float32(v))
        _, ldj = fwd(jnp.float32(v))
        np.testing.assert_allclose(float(jnp.log(g)), float(ldj), rtol=1e-3,
                                   atol=1e-3)


def test_softclamp_near_identity_for_small_inputs(rng):
    layer = flows.SoftClamp(cap=30.0)
    params = layer.init(rng, 2)
    z = jax.random.normal(rng, (2, 3, 2))
    zf, ldj = layer.forward(params, z, jnp.zeros(2, jnp.float32))
    np.testing.assert_allclose(np.asarray(zf), np.asarray(z), atol=2e-2)
    assert float(jnp.abs(ldj).max()) < 0.1


def test_actnorm_data_init_exact_with_cap(rng):
    layer = flows.ActNorm()
    z = jax.random.normal(rng, (16, 8, 3)) * 4.0 + 2.0
    params = layer.init(rng, 3)
    params, zf = layer.data_init(params, z)
    flat = np.asarray(zf).reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=1e-2)


def test_positive_elbo_guard_fires():
    """A fabricated positive batch-mean ELBO must raise the loss."""
    from categoricalnf_tpu import encodings, networks
    from categoricalnf_tpu.models import CategoricalFlow
    rng = jax.random.PRNGKey(0)
    enc = encodings.MixtureEncoding(num_categories=4, dim=2)
    net = networks.MLP(hidden_dim=8, compute_dtype="float32")
    model = CategoricalFlow(encoding=enc, flow=flows.FlowModel(layers=(
        flows.MixtureCDFCoupling(net=net, num_mixtures=2),)))
    params = model.init(rng)
    x = jax.random.randint(rng, (8, 4), 0, 4)
    loss = model.loss_bpd(params, x, rng)
    assert np.isfinite(float(loss))
    # untrained model: mean elbo strongly negative, guard must be inert
    parts = model.elbo(params, x, rng)
    assert float(parts["elbo"].mean()) < 0
