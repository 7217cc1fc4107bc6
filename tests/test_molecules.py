"""Chemistry utils + GraphCNF + molecule task tests."""

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu.tasks import chem
from categoricalnf_tpu.tasks.molecules import MoleculeTask


def test_random_molecules_are_valid():
    rng = np.random.default_rng(0)
    n, N = 20, 12
    atoms = np.zeros((n, N), np.int32)
    edges = np.zeros((n, N * (N - 1) // 2), np.int32)
    mask = np.zeros((n, N), np.float32)
    for b in range(n):
        k = int(rng.integers(4, N + 1))
        a, adj = chem.random_molecule(rng, k)
        atoms[b, :k] = a
        full = np.zeros((N, N), np.int64)
        full[:k, :k] = adj
        edges[b] = chem.dense_to_edges(full)
        mask[b, :k] = 1.0
    valid = chem.molecule_validity(atoms, edges, mask)
    assert valid.all(), f"{valid.mean()} of synthetic molecules valid"


def test_validity_catches_violations():
    # 3 atoms: F-F with extra bond to F is invalid (F max valence 1)
    N = 3
    atoms = np.asarray([[3, 3, 3]], np.int32)  # F F F
    edges = np.zeros((1, 3), np.int32)
    edges[0, 0] = 1  # F0-F1
    edges[0, 1] = 1  # F0-F2 -> F0 has valence 2 > 1
    mask = np.ones((1, N), np.float32)
    assert not chem.molecule_validity(atoms, edges, mask)[0]


def test_validity_definitions_reference_vs_strict():
    """Reference-comparable validity (valence-only, RDKit-sanitization
    equivalent) accepts fragments/isolated atoms; strict does not."""
    N = 4
    # two disconnected C-C fragments: valence-fine, not one molecule
    atoms = np.asarray([[0, 0, 0, 0]], np.int32)
    edges = np.zeros((1, 6), np.int32)
    edges[0, 0] = 1  # C0-C1
    edges[0, 5] = 1  # C2-C3
    mask = np.ones((1, N), np.float32)
    assert chem.molecule_validity(atoms, edges, mask,
                                  check_connected=False)[0]
    assert not chem.molecule_validity(atoms, edges, mask)[0]

    # isolated atom next to a bonded pair: same split
    edges2 = np.zeros((1, 6), np.int32)
    edges2[0, 0] = 1  # C0-C1, C2 isolated
    mask2 = np.asarray([[1, 1, 1, 0]], np.float32)
    assert chem.molecule_validity(atoms, edges2, mask2,
                                  check_connected=False)[0]
    assert not chem.molecule_validity(atoms, edges2, mask2)[0]

    # valence violation fails BOTH definitions
    atoms_f = np.asarray([[3, 3, 3, 3]], np.int32)  # F chain
    edges3 = np.zeros((1, 6), np.int32)
    edges3[0, 0] = 1
    edges3[0, 3] = 1  # F1 valence 2 > 1
    assert not chem.molecule_validity(atoms_f, edges3, mask,
                                      check_connected=False)[0]
    assert not chem.molecule_validity(atoms_f, edges3, mask)[0]


def test_sample_quality_uses_chosen_definition():
    atoms = np.asarray([[0, 0, 0, 0]], np.int32)
    edges = np.zeros((1, 6), np.int32)
    edges[0, 0] = 1
    edges[0, 5] = 1  # two fragments
    mask = np.ones((1, 4), np.float32)
    ref = chem.sample_quality(atoms, edges, mask, check_connected=False)
    strict = chem.sample_quality(atoms, edges, mask, check_connected=True)
    assert ref["validity"] == 1.0 and strict["validity"] == 0.0


def test_valency_correction_fixes_violations():
    N = 4
    atoms = np.asarray([[0, 2, 2, 2]], np.int32)  # C O O O
    # C bonded to all three O with double bonds -> valence 6 > 4
    edges = np.zeros((1, 6), np.int32)
    # pairs order: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)
    edges[0, 0] = 2
    edges[0, 1] = 2
    edges[0, 2] = 2
    mask = np.ones((1, N), np.float32)
    assert not chem.molecule_validity(atoms, edges, mask)[0]
    fixed, fixed_mask = chem.valency_correction(atoms, edges, mask)
    assert chem.molecule_validity(atoms, fixed, fixed_mask)[0]


def test_wl_hash_invariance():
    rng = np.random.default_rng(1)
    a, adj = chem.random_molecule(rng, 8)
    N = 8
    perm = rng.permutation(N)
    a2 = a[perm]
    adj2 = adj[np.ix_(perm, perm)]
    mask = np.ones(N, np.float32)
    h1 = chem.wl_hash(a, chem.dense_to_edges(adj), mask)
    h2 = chem.wl_hash(a2, chem.dense_to_edges(adj2), mask)
    assert h1 == h2
    # different molecule -> different hash
    a3, adj3 = chem.random_molecule(np.random.default_rng(2), 8)
    h3 = chem.wl_hash(a3, chem.dense_to_edges(adj3), mask)
    assert h1 != h3


def _tiny_task():
    return MoleculeTask(max_nodes=9, batch_size=8, num_layers_node=1,
                        num_layers_edge=1, hidden_dim=32, num_mixtures=4,
                        synth_size=64, eval_batches_count=1)


def test_graphcnf_loss_eval(rng):
    task = _tiny_task()
    params = task.init_params(rng)
    batch = next(task.train_batches(np.random.default_rng(0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    loss = float(task.loss(params, batch, rng, 1.0))
    assert np.isfinite(loss) and loss > 0
    bpd = task.eval_step(params, batch, rng, 2)
    assert np.all(np.isfinite(np.asarray(bpd)))


def test_graphcnf_data_init_and_sampling(rng):
    task = _tiny_task()
    params = task.init_params(rng)
    batch = next(task.train_batches(np.random.default_rng(0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = task.data_init(params, batch, rng)
    m = task.sample_metrics(params, rng, num_samples=16)
    assert set(m) == {"validity", "validity_ci95", "uniqueness", "novelty",
                      "validity_strict",
                      "validity_corrected", "uniqueness_corrected",
                      "novelty_corrected", "metric_num_samples"}
    assert m["metric_num_samples"] == 16.0
    assert 0.0 <= m["validity"] <= 1.0
    # strict (connected) validity can only be harder to satisfy
    assert m["validity_strict"] <= m["validity"] + 1e-9
    assert m["validity_corrected"] >= m["validity_strict"] - 1e-9


def test_graphcnf_stage_temperatures(rng):
    """Per-stage sampling temperatures: scalar T ≡ (T,T,T) exactly, and
    the existence/bond-stage temperature cannot alter the node draw
    (stage-1 isolation of the ancestral order)."""
    task = _tiny_task()
    params = task.init_params(rng)
    node_mask = jnp.ones((4, task.max_nodes), jnp.float32)
    a_scalar, e_scalar = task.model.sample(params, rng, node_mask,
                                           temperature=1.0)
    a_vec, e_vec = task.model.sample(params, rng, node_mask,
                                     temperature=(1.0, 1.0, 1.0))
    np.testing.assert_array_equal(np.asarray(a_scalar), np.asarray(a_vec))
    np.testing.assert_array_equal(np.asarray(e_scalar), np.asarray(e_vec))
    a_cold, e_cold = task.model.sample(params, rng, node_mask,
                                       temperature=(1.0, 0.5, 0.5))
    np.testing.assert_array_equal(np.asarray(a_scalar), np.asarray(a_cold))
    # metrics plumbing accepts the tuple form
    m = task.sample_metrics(params, rng, num_samples=8,
                            temperature=(1.0, 0.7, 1.0))
    assert 0.0 <= m["validity"] <= 1.0


def test_graphcnf_training_step_reduces_loss(rng):
    import optax
    task = _tiny_task()
    params = task.init_params(rng)
    b0 = next(task.train_batches(np.random.default_rng(0)))
    b0 = {k: jnp.asarray(v) for k, v in b0.items()}
    params = task.data_init(params, b0, rng)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, batch, key):
        loss, g = jax.value_and_grad(
            lambda pp: task.loss(pp, batch, key, 1.0))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    it = task.train_batches(np.random.default_rng(1))
    losses = []
    for i in range(30):
        b = {k: jnp.asarray(v) for k, v in next(it).items()}
        params, opt, loss = step(params, opt, b, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.1, (
        losses[:3], losses[-3:])
