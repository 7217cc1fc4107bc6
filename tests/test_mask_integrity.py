"""Masked-density integrity: transforms of VALID positions must be fully
independent of z-values at masked-out positions, and the claimed ldj must
equal the log-determinant of the valid-dims sub-Jacobian.

Regression for the bond-stage leak (EdgeGNN ignored the transform mask):
valid bond transforms read virtual-edge z values — an unpaid noise channel
worth +44 fake nats.
"""

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu.models.graphcnf import GraphCNF
from categoricalnf_tpu.networks.graph import pair_indices
from categoricalnf_tpu.tasks.graph_coloring import build_coloring_flow


def _valid_submap_check(flow, fp, z, cond, mask, rng, tol=2e-2):
    shape = z.shape
    D = shape[-1]
    vmask = np.repeat(np.asarray(mask).reshape(-1), D).astype(bool)

    def f(flat):
        zz = flat.reshape(shape)
        out, _ = flow.forward(fp, zz, cond=cond, mask=mask)
        return out.reshape(-1)

    J = np.asarray(jax.jacfwd(f)(z.reshape(-1)), np.float64)
    vidx = np.nonzero(vmask)[0]
    midx = np.nonzero(~vmask)[0]
    leak = np.abs(J[np.ix_(vidx, midx)]).max() if len(midx) else 0.0
    sign, true_ld = np.linalg.slogdet(J[np.ix_(vidx, vidx)])
    _, ldj = flow.forward(fp, z, cond=cond, mask=mask)
    assert leak < 1e-6, f"masked->valid leakage {leak}"
    # sign may legitimately be -1 (LU 1x1 with negative det); the claimed
    # ldj must match log|det| of the valid sub-Jacobian.
    np.testing.assert_allclose(float(ldj[0]), true_ld, atol=tol, rtol=tol)


def test_graphcnf_bond_stage_no_masked_leakage(rng):
    m = GraphCNF(num_atom_types=4, num_bond_types=3, max_nodes=6,
                 node_dim=2, exist_dim=2, bond_dim=2,
                 num_layers_node=2, num_layers_edge=2, hidden_dim=16,
                 num_mixtures=3)
    params = m.init(rng)
    B = 1
    node_mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.float32)
    E = m.num_edges
    # a sparse bond mask within valid edges
    e_mask = m.edge_mask(node_mask)
    key = jax.random.fold_in(rng, 1)
    bond_mask = e_mask * (jax.random.uniform(key, (B, E)) < 0.4)

    z_v = jax.random.normal(jax.random.fold_in(rng, 2), (B, 6, m.node_dim))
    z_e1 = jax.random.normal(jax.random.fold_in(rng, 3), (B, E, m.exist_dim))
    z_e2 = jax.random.normal(jax.random.fold_in(rng, 4), (B, E, m.bond_dim))

    cond = {"node_feat": z_v, "node_mask": node_mask, "edge_feat": z_e1}
    _valid_submap_check(m.flow_bond, params["flow_bond"], z_e2, cond,
                        bond_mask, rng)


def test_graphcnf_exist_stage_no_masked_leakage(rng):
    m = GraphCNF(num_atom_types=4, num_bond_types=3, max_nodes=6,
                 node_dim=2, exist_dim=2, bond_dim=2,
                 num_layers_node=2, num_layers_edge=2, hidden_dim=16,
                 num_mixtures=3)
    params = m.init(rng)
    node_mask = jnp.asarray([[1, 1, 1, 0, 0, 0]], jnp.float32)
    E = m.num_edges
    e_mask = m.edge_mask(node_mask)
    z_v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 6, m.node_dim))
    z_e1 = jax.random.normal(jax.random.fold_in(rng, 3), (1, E, m.exist_dim))
    cond = {"node_feat": z_v, "node_mask": node_mask}
    _valid_submap_check(m.flow_exist, params["flow_exist"], z_e1, cond,
                        e_mask, rng)


def test_bond_gating_consistency(rng, monkeypatch):
    """Sampling must invert the bond flow under the SAME mask the density
    direction trains with (bond_mask = e_mask * exist), not the plain edge
    mask — otherwise the EdgeGNN conditions real-edge transforms on
    virtual-edge prior noise the trained density excludes (VERDICT r1 #1).
    """
    from categoricalnf_tpu.flows.model import FlowModel

    m = GraphCNF(num_atom_types=4, num_bond_types=3, max_nodes=6,
                 node_dim=2, exist_dim=2, bond_dim=2,
                 num_layers_node=2, num_layers_edge=2, hidden_dim=16,
                 num_mixtures=3)
    params = m.init(rng)
    node_mask = jnp.asarray([[1, 1, 1, 1, 1, 0],
                             [1, 1, 1, 1, 1, 1]], jnp.float32)

    calls = []
    orig = FlowModel.inverse

    def spy(self, p, z, ldj=None, *, cond=None, mask=None, rng=None):
        out = orig(self, p, z, ldj, cond=cond, mask=mask, rng=rng)
        calls.append({"mask": mask, "z_out": out[0]})
        return out

    monkeypatch.setattr(FlowModel, "inverse", spy)
    m.sample(params, jax.random.fold_in(rng, 5), node_mask)
    assert len(calls) == 3  # node, exist, bond stages

    e_mask = m.edge_mask(node_mask)
    exist = m.enc_exist.decode(params["enc_exist"], calls[1]["z_out"])
    expected = np.asarray(e_mask) * np.asarray(exist, np.float32)
    np.testing.assert_allclose(np.asarray(calls[2]["mask"]), expected)


def test_graphcnf_bond_stage_no_masked_leakage_levers(rng):
    """The round-2 bond-stage levers (live-edge degree normalisation +
    decoded-exist conditioning) must preserve masked-density integrity."""
    m = GraphCNF(num_atom_types=4, num_bond_types=3, max_nodes=6,
                 node_dim=2, exist_dim=2, bond_dim=2,
                 num_layers_node=2, num_layers_edge=2, hidden_dim=16,
                 num_mixtures=3, edge_degree_norm="live_edges",
                 bond_cond_exist=True, node_cond_atoms=True,
                 bond_cond_degree=True)
    params = m.init(rng)
    B = 1
    node_mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.float32)
    E = m.num_edges
    e_mask = m.edge_mask(node_mask)
    key = jax.random.fold_in(rng, 1)
    exist = ((jax.random.uniform(key, (B, E)) < 0.4) * e_mask
             ).astype(jnp.int32)
    bond_mask = e_mask * exist.astype(jnp.float32)

    z_v = jax.random.normal(jax.random.fold_in(rng, 2), (B, 6, m.node_dim))
    z_e1 = jax.random.normal(jax.random.fold_in(rng, 3), (B, E, m.exist_dim))
    z_e2 = jax.random.normal(jax.random.fold_in(rng, 4), (B, E, m.bond_dim))
    atoms = jax.random.randint(jax.random.fold_in(rng, 6), (B, 6), 0, 4)

    nf = m._bond_node_feat(m._node_feat(z_v, atoms, node_mask), exist,
                           e_mask, node_mask)
    cond = {"node_feat": nf, "node_mask": node_mask,
            "edge_feat": m._bond_edge_feat(z_e1, exist, e_mask)}
    _valid_submap_check(m.flow_bond, params["flow_bond"], z_e2, cond,
                        bond_mask, rng)


def test_bond_cond_exist_sampling_consistency(rng, monkeypatch):
    """With bond_cond_exist=True, the sampling-side bond inverse must see
    exactly the conditioning features the density direction trains with:
    edge_feat = concat([z_e1, onehot(exist) * e_mask])."""
    from categoricalnf_tpu.flows.model import FlowModel

    m = GraphCNF(num_atom_types=4, num_bond_types=3, max_nodes=6,
                 node_dim=2, exist_dim=2, bond_dim=2,
                 num_layers_node=2, num_layers_edge=2, hidden_dim=16,
                 num_mixtures=3, edge_degree_norm="live_edges",
                 bond_cond_exist=True, node_cond_atoms=True,
                 bond_cond_degree=True)
    params = m.init(rng)
    node_mask = jnp.asarray([[1, 1, 1, 1, 1, 0]], jnp.float32)

    calls = []
    orig = FlowModel.inverse

    def spy(self, p, z, ldj=None, *, cond=None, mask=None, rng=None):
        out = orig(self, p, z, ldj, cond=cond, mask=mask, rng=rng)
        calls.append({"cond": cond, "mask": mask, "z_out": out[0]})
        return out

    monkeypatch.setattr(FlowModel, "inverse", spy)
    m.sample(params, jax.random.fold_in(rng, 5), node_mask)
    assert len(calls) == 3

    e_mask = m.edge_mask(node_mask)
    z_v = calls[0]["z_out"]
    atoms = m.enc_node.decode(params["enc_node"], z_v)
    expected_node_feat = m._node_feat(z_v, atoms, node_mask)
    got_nf1 = calls[1]["cond"]["node_feat"]
    assert got_nf1.shape[-1] == m.node_dim + m.num_atom_types
    np.testing.assert_allclose(np.asarray(got_nf1),
                               np.asarray(expected_node_feat),
                               rtol=1e-6, atol=1e-6)
    z_e1 = calls[1]["z_out"]
    exist = m.enc_exist.decode(params["enc_exist"], z_e1)
    # the BOND stage additionally sees the decoded-degree one-hot
    expected_nf2 = m._bond_node_feat(expected_node_feat, exist, e_mask,
                                     node_mask)
    got_nf2 = calls[2]["cond"]["node_feat"]
    assert got_nf2.shape[-1] == m.node_dim + m.num_atom_types + 6
    np.testing.assert_allclose(np.asarray(got_nf2),
                               np.asarray(expected_nf2),
                               rtol=1e-6, atol=1e-6)
    expected_feat = m._bond_edge_feat(z_e1, exist, e_mask)
    got = calls[2]["cond"]["edge_feat"]
    assert got.shape[-1] == m.exist_dim + 2
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected_feat),
                               rtol=1e-6, atol=1e-6)
    # density direction with the SAME (exist, z_e1) builds the same feature
    np.testing.assert_allclose(
        np.asarray(m._bond_edge_feat(z_e1, exist, e_mask)),
        np.asarray(got), rtol=1e-6, atol=1e-6)
    # mask consistency still holds under the new conditioning
    expected_mask = np.asarray(e_mask) * np.asarray(exist, np.float32)
    np.testing.assert_allclose(np.asarray(calls[2]["mask"]), expected_mask)


def test_edgegnn_degree_norm_equivalence(rng):
    """live_edges degree == nodes degree whenever the transform mask is the
    full valid-pair mask (the existence stage), so flipping the flag cannot
    change the stage-2 function; it only rescales the sparse bond stage."""
    from categoricalnf_tpu.networks.graph import EdgeGNN

    n, B = 6, 2
    E = n * (n - 1) // 2
    kw = dict(num_nodes=n, hidden_dim=16, num_layers=2, edge_feat_dim=0)
    from categoricalnf_tpu.networks.common import dense_init

    net_a = EdgeGNN(degree_norm="nodes", **kw)
    net_b = EdgeGNN(degree_norm="live_edges", **kw)
    params = net_a.init(rng, 3, 4, cond_dim=2)
    # the output head is zero-init by design; randomise it so the
    # comparison sees the network body
    params = dict(params)
    params["out"] = dense_init(jax.random.fold_in(rng, 9), 16, 4)
    node_mask = jnp.asarray([[1, 1, 1, 1, 0, 0],
                             [1, 1, 1, 1, 1, 1]], jnp.float32)
    ii, jj = pair_indices(n)
    e_mask = node_mask[:, ii] * node_mask[:, jj]
    x = jax.random.normal(jax.random.fold_in(rng, 1), (B, E, 3))
    cond = {"node_feat": jax.random.normal(jax.random.fold_in(rng, 2),
                                           (B, n, 2)),
            "node_mask": node_mask}
    ya = net_a.apply(params, x, cond=cond, mask=e_mask)
    yb = net_b.apply(params, x, cond=cond, mask=e_mask)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)
    # and they genuinely differ once the mask is sparser than the pair mask
    sparse = e_mask * (jax.random.uniform(jax.random.fold_in(rng, 3),
                                          (B, E)) < 0.3)
    ya = net_a.apply(params, x, cond=cond, mask=sparse)
    yb = net_b.apply(params, x, cond=cond, mask=sparse)
    assert np.abs(np.asarray(ya) - np.asarray(yb)).max() > 1e-4


def test_graphcnf_levers_elbo_sample_smoke(rng):
    m = GraphCNF(num_atom_types=4, num_bond_types=3, max_nodes=6,
                 node_dim=2, exist_dim=2, bond_dim=2,
                 num_layers_node=2, num_layers_edge=2, hidden_dim=16,
                 num_mixtures=3, edge_degree_norm="live_edges",
                 bond_cond_exist=True, node_cond_atoms=True,
                 bond_cond_degree=True)
    params = m.init(rng)
    B, N, E = 2, 6, m.num_edges
    node_mask = jnp.ones((B, N), jnp.float32)
    atoms = jax.random.randint(jax.random.fold_in(rng, 1), (B, N), 0, 4)
    edges = jax.random.randint(jax.random.fold_in(rng, 2), (B, E), 0, 4)
    params = m.data_init(params, atoms, edges, node_mask,
                         jax.random.fold_in(rng, 3))
    parts = m.elbo(params, atoms, edges, node_mask,
                   jax.random.fold_in(rng, 4))
    assert np.isfinite(float(parts["elbo"].sum()))
    a, e = m.sample(params, jax.random.fold_in(rng, 5), node_mask)
    assert a.shape == (B, N) and e.shape == (B, E)


def test_set_flow_no_masked_leakage(rng):
    from categoricalnf_tpu.tasks.set_modeling import build_set_flow
    flow = build_set_flow(2, num_layers=2, hidden_dim=16, num_mixtures=3,
                          scan_blocks=False)
    params = flow.init(rng, 2, 0)
    mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.float32)
    z = jax.random.normal(rng, (1, 5, 2))
    _valid_submap_check(flow, params, z, None, mask, rng)


def test_coloring_flow_no_masked_leakage(rng):
    flow = build_coloring_flow(2, num_layers=2, hidden_dim=16,
                               num_mixtures=3, scan_blocks=False)
    params = flow.init(rng, 2, 0)
    node_mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.float32)
    adj = jnp.zeros((1, 6, 6)).at[0, 0, 1].set(1.0).at[0, 1, 0].set(1.0)
    z = jax.random.normal(rng, (1, 6, 2))
    _valid_submap_check(flow, params, z, {"adj": adj}, node_mask, rng)
