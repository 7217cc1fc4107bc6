"""ScannedBlocks must be semantically identical to the unrolled stack."""

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu import flows, networks
from categoricalnf_tpu.flows.scanned import _slice_d

B, T, D = 4, 5, 4


def _block():
    net = networks.MLP(hidden_dim=16, compute_dtype="float32")
    return (flows.ActNorm(), flows.InvertibleLinear(),
            flows.MixtureCDFCoupling(net=net, parity=0, num_mixtures=3),
            flows.SoftClamp(),
            flows.MixtureCDFCoupling(net=net, parity=1, num_mixtures=3),
            flows.SoftClamp())


def test_scanned_matches_unrolled(rng):
    block = _block()
    depth = 3
    scanned = flows.ScannedBlocks(block=block, depth=depth)
    params = scanned.init(rng, D)
    z = jax.random.normal(jax.random.fold_in(rng, 2), (B, T, D))
    ldj0 = jnp.zeros(B, jnp.float32)

    zs, ldjs = scanned.forward(params, z, ldj0)

    # manual unroll using the same sliced parameters
    zu, ldju = z, ldj0
    for d in range(depth):
        for li, layer in enumerate(block):
            zu, ldju = layer.forward(_slice_d(params[li], d), zu, ldju)
    np.testing.assert_allclose(np.asarray(zs), np.asarray(zu), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldjs), np.asarray(ldju),
                               rtol=1e-5, atol=1e-5)


def test_unroll_matches_unroll1(rng):
    """unroll>1 is a pure XLA scheduling lever: results (fwd, inverse,
    ldj) must be bit-comparable to unroll=1."""
    block = _block()
    s1 = flows.ScannedBlocks(block=block, depth=4, unroll=1)
    s2 = flows.ScannedBlocks(block=block, depth=4, unroll=2)
    params = s1.init(rng, D)
    z = jax.random.normal(jax.random.fold_in(rng, 5), (B, T, D))
    ldj0 = jnp.zeros(B, jnp.float32)
    za, la = jax.jit(s1.forward)(params, z, ldj0)
    zb, lb = jax.jit(s2.forward)(params, z, ldj0)
    np.testing.assert_allclose(np.asarray(za), np.asarray(zb), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6,
                               atol=1e-6)
    zia, _ = jax.jit(s1.inverse)(params, za, la)
    zib, _ = jax.jit(s2.inverse)(params, zb, lb)
    np.testing.assert_allclose(np.asarray(zia), np.asarray(zib), rtol=1e-6,
                               atol=1e-6)


def test_scanned_roundtrip(rng):
    scanned = flows.ScannedBlocks(block=_block(), depth=2)
    params = scanned.init(rng, D)
    z = jax.random.normal(rng, (B, T, D))
    ldj0 = jnp.zeros(B, jnp.float32)
    zf, ldj = scanned.forward(params, z, ldj0)
    zr, ldj_r = scanned.inverse(params, zf, ldj)
    np.testing.assert_allclose(np.asarray(zr), np.asarray(z), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(ldj_r), 0.0, atol=1e-3)


def test_scanned_data_init(rng):
    scanned = flows.ScannedBlocks(block=_block(), depth=2)
    params = scanned.init(rng, D)
    z = jax.random.normal(rng, (B, T, D)) * 3.0 + 1.0
    model = flows.FlowModel(layers=(scanned,))
    p2 = model.init(rng, D)
    p2 = model.data_init(p2, z)
    zf, _ = model.forward(p2, z)
    # first actnorm of first block should have normalised its input
    assert np.all(np.isfinite(np.asarray(zf)))
    lp = model.log_prob(p2, z)
    assert np.all(np.isfinite(np.asarray(lp)))


def test_scanned_in_flow_model_with_mask(rng):
    scanned = flows.ScannedBlocks(block=_block(), depth=2)
    model = flows.FlowModel(layers=(scanned,))
    params = model.init(rng, D)
    mask = (jnp.arange(T)[None, :] < jnp.array([[5], [4], [3], [2]])
            ).astype(jnp.float32).reshape(B, T)
    z = jax.random.normal(rng, (B, T, D))
    zf, ldj = model.forward(params, z, mask=mask)
    zr, ldj_r = model.inverse(params, zf, ldj, mask=mask)
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(zr) * m, np.asarray(z) * m,
                               rtol=1e-3, atol=1e-3)


def test_remat_gradients_match_nonremat(rng):
    """jax.checkpoint on the scan body must change only memory, not
    values or gradients (GraphCNF flows run with remat=True)."""
    block = _block()
    plain = flows.ScannedBlocks(block=block, depth=3)
    remat = flows.ScannedBlocks(block=block, depth=3, remat=True)
    params = plain.init(rng, D)
    z = jax.random.normal(jax.random.fold_in(rng, 5), (B, T, D))
    ldj0 = jnp.zeros(B, jnp.float32)

    def loss(m):
        def f(p):
            zz, ldj = m.forward(p, z, ldj0)
            return (zz ** 2).sum() + ldj.sum()
        return f

    v0, g0 = jax.value_and_grad(loss(plain))(params)
    v1, g1 = jax.value_and_grad(loss(remat))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
