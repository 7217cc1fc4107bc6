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
