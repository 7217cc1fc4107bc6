"""Invertibility + ldj property tests for every flow layer (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from categoricalnf_tpu import flows
from categoricalnf_tpu import networks

B, T, D = 8, 6, 4


def _roundtrip(layer, rng, z, cond=None, mask=None, tol=1e-4):
    params = layer.init(rng, z.shape[-1], 0 if cond is None else cond.shape[-1])
    ldj0 = jnp.zeros(z.shape[0], jnp.float32)
    zf, ldj_f = layer.forward(params, z, ldj0, cond=cond, mask=mask)
    zr, ldj_r = layer.inverse(params, zf, ldj_f, cond=cond, mask=mask)
    if mask is not None:
        m = np.asarray(mask)[..., None]
        np.testing.assert_allclose(np.asarray(zr) * m, np.asarray(z) * m,
                                   rtol=tol, atol=tol)
    else:
        np.testing.assert_allclose(np.asarray(zr), np.asarray(z),
                                   rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(ldj_r), 0.0, atol=tol)
    return params, zf, ldj_f


@pytest.fixture
def z(rng):
    return jax.random.normal(jax.random.fold_in(rng, 1), (B, T, D)) * 1.5


@pytest.fixture
def mask(rng):
    lengths = jnp.array([T, T, T - 1, T - 2, 3, 2, 1, T])
    return (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)


def test_actnorm_roundtrip(rng, z, mask):
    _roundtrip(flows.ActNorm(), rng, z, mask=mask)


def test_actnorm_data_init(rng, z, mask):
    layer = flows.ActNorm()
    params = layer.init(rng, D)
    params, zf = layer.data_init(params, z, mask=mask)
    m = np.asarray(mask).reshape(-1, 1)
    flat = np.asarray(zf).reshape(-1, D)
    mean = (flat * m).sum(0) / m.sum()
    var = (((flat - mean) ** 2) * m).sum(0) / m.sum()
    np.testing.assert_allclose(mean, 0.0, atol=1e-4)
    np.testing.assert_allclose(var, 1.0, atol=1e-2)


def test_invertible_linear_roundtrip(rng, z, mask):
    _roundtrip(flows.InvertibleLinear(), rng, z, mask=mask, tol=2e-4)


def test_invertible_linear_ldj_is_logdet(rng, z):
    layer = flows.InvertibleLinear()
    params = layer.init(rng, D)
    # Perturb away from the orthogonal (logdet=0) init for a meaningful check.
    params = dict(params)
    params["log_s"] = params["log_s"] + jnp.array([0.3, -0.2, 0.5, 0.1])
    w = layer._weight(params)
    _, logdet = np.linalg.slogdet(np.asarray(w))
    ldj0 = jnp.zeros(B, jnp.float32)
    _, ldj = layer.forward(params, z, ldj0)
    np.testing.assert_allclose(np.asarray(ldj), logdet * T, rtol=1e-4,
                               atol=1e-5)


def test_invertible_linear_buffers_get_no_gradient(rng, z):
    """perm / sign_s are fixed buffers: training them mines free logdet
    (regression: ELBO > 0 exploit via trained 'permutation' matrices)."""
    layer = flows.InvertibleLinear()
    params = layer.init(rng, D)

    def loss(p):
        out, ldj = layer.forward(p, z, jnp.zeros(B, jnp.float32))
        return jnp.sum(out ** 2) + jnp.sum(ldj)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["perm"]).max()) == 0.0
    assert float(jnp.abs(g["sign_s"]).max()) == 0.0
    # trainable parts still get gradients
    assert float(jnp.abs(g["log_s"]).max()) > 0.0


def test_invertible_linear_ldj_true_logdet_after_perturbation(rng, z):
    """Even if buffers are perturbed (e.g. by a bad optimizer state), the
    claimed ldj must track slogdet of the materialised weight."""
    layer = flows.InvertibleLinear()
    params = dict(layer.init(rng, D))
    params["log_s"] = params["log_s"] + 0.4
    params["lower"] = params["lower"] + 0.1
    w = layer._weight(params)
    _, logdet = np.linalg.slogdet(np.asarray(w))
    _, ldj = layer.forward(params, z, jnp.zeros(B, jnp.float32))
    np.testing.assert_allclose(np.asarray(ldj), logdet * T, rtol=1e-4,
                               atol=1e-4)


def test_reverse_channels(rng, z):
    _roundtrip(flows.ReverseChannels(), rng, z)


def test_sigmoid_roundtrip(rng, z):
    _roundtrip(flows.Sigmoid(), rng, z * 0.5, tol=1e-3)


def test_coupling_channel_roundtrip(rng, z, mask):
    net = networks.MLP(hidden_dim=32, compute_dtype="float32")
    layer = flows.MixtureCDFCoupling(net=net, mask_kind="channel",
                                     parity=0, num_mixtures=4)
    _roundtrip(layer, rng, z, mask=mask, tol=5e-4)


def test_coupling_checker_roundtrip(rng, z):
    net = networks.MLP(hidden_dim=32, compute_dtype="float32")
    layer = flows.MixtureCDFCoupling(net=net, mask_kind="checker",
                                     parity=1, num_mixtures=4)
    _roundtrip(layer, rng, z, tol=5e-4)


def test_coupling_identity_at_init_modulo_offsets(rng, z):
    """Zero-init net → transform is a fixed smooth monotone map; with
    mean_offsets zeroed it must be the exact identity."""
    net = networks.MLP(hidden_dim=16, compute_dtype="float32")
    layer = flows.MixtureCDFCoupling(net=net, num_mixtures=4)
    params = layer.init(rng, D, 0)
    params = dict(params)
    params["mean_offsets"] = jnp.zeros_like(params["mean_offsets"])
    zf, ldj = layer.forward(params, z, jnp.zeros(B, jnp.float32))
    np.testing.assert_allclose(np.asarray(zf), np.asarray(z), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj), 0.0, atol=1e-3)


def test_coupling_transformer_roundtrip(rng, z, mask):
    net = networks.SetTransformer(hidden_dim=32, num_heads=2, num_layers=1,
                                  compute_dtype="float32")
    layer = flows.MixtureCDFCoupling(net=net, mask_kind="channel",
                                     num_mixtures=4)
    _roundtrip(layer, rng, z, mask=mask, tol=5e-4)


def test_autoregressive_roundtrip(rng, z):
    net = networks.CausalLSTM(hidden_dim=32, compute_dtype="float32")
    layer = flows.AutoregressiveMixtureCDF(net=net, num_mixtures=4)
    _roundtrip(layer, rng, z, tol=5e-4)


def test_autoregressive_channel_coupling_roundtrip(rng, z):
    for parity in (0, 1):
        net = networks.CausalLSTM(hidden_dim=32, extra_dim=D,
                                  compute_dtype="float32")
        layer = flows.AutoregressiveMixtureCDF(net=net, num_mixtures=4,
                                               parity=parity)
        _roundtrip(layer, rng, z, tol=5e-4)


def test_autoregressive_channel_coupling_uses_current_step(rng, z):
    """With parity set, the transform of step t's masked-out channels must
    depend on step t's masked-in channels (within-step joint structure)."""
    net = networks.CausalLSTM(hidden_dim=32, extra_dim=D,
                              compute_dtype="float32")
    layer = flows.AutoregressiveMixtureCDF(net=net, num_mixtures=4, parity=0)
    params = layer.init(rng, D, 0)
    # randomise the zero-init output head so dependence is observable
    params = dict(params)
    net_p = dict(params["net"])
    net_p["out"] = dict(net_p["out"])
    net_p["out"]["w"] = jax.random.normal(rng, net_p["out"]["w"].shape) * 0.1
    params["net"] = net_p
    ldj0 = jnp.zeros(B, jnp.float32)
    m = np.asarray(flows.make_channel_mask(D, 0))
    in_idx = int(np.nonzero(m)[0][0])
    out_idx = int(np.nonzero(1 - m)[0][0])
    z2 = z.at[:, 2, in_idx].set(z[:, 2, in_idx] + 5.0)
    o1, _ = layer.forward(params, z, ldj0)
    o2, _ = layer.forward(params, z2, ldj0)
    # same-step transformed channel must differ
    assert not np.allclose(np.asarray(o1[:, 2, out_idx]),
                           np.asarray(o2[:, 2, out_idx]))
    # earlier steps must be untouched (causality)
    np.testing.assert_allclose(np.asarray(o1[:, :2]), np.asarray(o2[:, :2]),
                               atol=1e-5)


def _randomize_head(rng, params):
    params = dict(params)
    net_p = dict(params["net"])
    net_p["out"] = dict(net_p["out"])
    net_p["out"]["w"] = jax.random.normal(rng, net_p["out"]["w"].shape) * 0.1
    params["net"] = net_p
    return params


def test_autoregressive_input_feats_roundtrip(rng, z):
    """Soft-classifier input features (input_feats>0) must keep the exact
    sequential inverse: the density pass concatenates feats(z_{t-1}) into
    the shifted net input, and the sampling scan reproduces the same
    features from its own reconstructed outputs."""
    def nets(parity):
        extra = D if parity is not None else 0
        yield networks.CausalLSTM(hidden_dim=32, extra_dim=extra,
                                  compute_dtype="float32")
        yield networks.CausalTransformer(hidden_dim=32, num_layers=1,
                                         max_len=T, extra_dim=extra,
                                         compute_dtype="float32")

    for parity in (None, 0):
      for net in nets(parity):
        layer = flows.AutoregressiveMixtureCDF(net=net, num_mixtures=4,
                                               parity=parity, input_feats=5)
        params = layer.init(rng, D, 0)
        # randomise the zero-init head so the features influence the map
        params = _randomize_head(jax.random.fold_in(rng, 7), params)
        ldj0 = jnp.zeros(B, jnp.float32)
        zf, ldj_f = layer.forward(params, z, ldj0)
        zr, ldj_r = layer.inverse(params, zf, ldj_f)
        np.testing.assert_allclose(np.asarray(zr), np.asarray(z),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(ldj_r), 0.0, atol=5e-4)
        # the features must actually matter: zeroing them changes outputs
        p0 = dict(params)
        p0["feat"] = jax.tree.map(jnp.zeros_like, params["feat"])
        zf0, _ = layer.forward(p0, z, ldj0)
        assert not np.allclose(np.asarray(zf), np.asarray(zf0), atol=1e-6)


def test_autoregressive_causality(rng, z):
    """Output at position t must not depend on inputs at positions >= t."""
    net = networks.CausalLSTM(hidden_dim=32, compute_dtype="float32")
    layer = flows.AutoregressiveMixtureCDF(net=net, num_mixtures=4)
    params = layer.init(rng, D, 0)
    ldj0 = jnp.zeros(B, jnp.float32)
    z2 = z.at[:, -1].set(z[:, -1] + 100.0)
    out1, _ = layer.forward(params, z, ldj0)
    out2, _ = layer.forward(params, z2, ldj0)
    # All positions except the last must agree (last differs via its own input)
    np.testing.assert_allclose(np.asarray(out1[:, :-1]),
                               np.asarray(out2[:, :-1]), atol=1e-5)


def test_flow_model_stack(rng, z, mask):
    net = networks.MLP(hidden_dim=32, compute_dtype="float32")
    model = flows.FlowModel(layers=(
        flows.ActNorm(),
        flows.InvertibleLinear(),
        flows.MixtureCDFCoupling(net=net, parity=0, num_mixtures=4),
        flows.MixtureCDFCoupling(net=net, parity=1, num_mixtures=4),
        flows.ActNorm(),
    ))
    params = model.init(rng, D)
    params = model.data_init(params, z, mask=mask)
    zf, ldj = model.forward(params, z, mask=mask)
    zr, ldj_r = model.inverse(params, zf, ldj, mask=mask)
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(zr) * m, np.asarray(z) * m,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ldj_r), 0.0, atol=1e-3)
    # log_prob finite
    lp = model.log_prob(params, z, mask=mask)
    assert np.all(np.isfinite(np.asarray(lp)))


def test_flow_model_ldj_vs_autodiff(rng):
    """Full-stack ldj must equal log|det J| from autodiff on a small case."""
    net = networks.MLP(hidden_dim=16, compute_dtype="float32")
    model = flows.FlowModel(layers=(
        flows.ActNorm(),
        flows.MixtureCDFCoupling(net=net, parity=0, num_mixtures=3),
        flows.InvertibleLinear(),
        flows.MixtureCDFCoupling(net=net, parity=1, num_mixtures=3),
    ))
    d, t = 2, 2
    params = model.init(rng, d)
    x0 = jax.random.normal(jax.random.fold_in(rng, 9), (1, t, d))

    def flat_fwd(flat):
        z = flat.reshape(1, t, d)
        zf, _ = model.forward(params, z)
        return zf.reshape(-1)

    J = jax.jacfwd(flat_fwd)(x0.reshape(-1))
    _, logdet = np.linalg.slogdet(np.asarray(J))
    _, ldj = model.forward(params, x0)
    np.testing.assert_allclose(float(ldj[0]), logdet, rtol=1e-3, atol=1e-3)


def test_masked_positions_untouched_ldj(rng, z, mask):
    """ldj must only accumulate over valid positions."""
    layer = flows.ActNorm()
    params = layer.init(rng, D)
    params = {"bias": params["bias"] + 1.0,
              "log_scale": params["log_scale"] + 0.7}
    _, ldj = layer.forward(params, z, jnp.zeros(B, jnp.float32), mask=mask)
    lengths = np.asarray(mask).sum(axis=1)
    eff = 5.0 * np.tanh(0.7 / 5.0)  # actnorm tanh-caps its log-scale
    np.testing.assert_allclose(np.asarray(ldj), eff * D * lengths, rtol=1e-5)
