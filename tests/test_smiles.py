"""SMILES -> graph conversion tests (data/smiles.py, VERDICT r1 #3).

Hand-written SMILES with known graphs: organic-subset atoms, branches,
ring closures (incl. %nn), bracket atoms with charges/H counts, aromatic
kekulization, and failure modes.  Aromatic charged species and stereo are
parsed-and-collapsed by design (module docstring documents the scope).
"""

import numpy as np
import pytest

from categoricalnf_tpu.data.smiles import (SmilesError, parse_smiles,
                                           smiles_to_graph)
from categoricalnf_tpu.tasks import chem

IDX = {t: i for i, t in enumerate(chem.ATOM_TYPES)}


def _valid(ids, adj):
    """Run the task-level valency/connectivity check on one molecule."""
    n = len(ids)
    N = max(n, 2)
    atoms = np.zeros((1, N), np.int64)
    atoms[0, :n] = ids
    full = np.zeros((N, N), np.int64)
    full[:n, :n] = adj
    edges = chem.dense_to_edges(full)[None]
    mask = (np.arange(N) < n)[None].astype(np.float32)
    return bool(chem.molecule_validity(atoms, edges, mask)[0])


def test_ethanol_linear_chain():
    ids, adj = smiles_to_graph("CCO")
    assert [chem.ATOM_TYPES[i] for i in ids] == ["C", "C", "O"]
    assert adj[0, 1] == 1 and adj[1, 2] == 1 and adj[0, 2] == 0
    assert _valid(ids, adj)


def test_bond_orders_and_branch():
    # isobutylene: C(=C)(C)C  — double bond + two branches
    ids, adj = smiles_to_graph("C(=C)(C)C")
    assert adj[0, 1] == 2 and adj[0, 2] == 1 and adj[0, 3] == 1
    assert _valid(ids, adj)
    # acetonitrile triple bond
    ids, adj = smiles_to_graph("CC#N")
    assert adj[1, 2] == 3
    assert _valid(ids, adj)


def test_ring_closure_cyclohexane():
    ids, adj = smiles_to_graph("C1CCCCC1")
    assert len(ids) == 6
    assert adj[0, 5] == 1 and adj.sum() == 2 * 6  # 6 single bonds
    assert _valid(ids, adj)


def test_percent_ring_label():
    a1 = smiles_to_graph("C%10CCCCC%10")[1]
    a2 = smiles_to_graph("C1CCCCC1")[1]
    np.testing.assert_array_equal(a1, a2)


def test_two_char_elements():
    ids, adj = smiles_to_graph("ClCBr")
    assert [chem.ATOM_TYPES[i] for i in ids] == ["Cl", "C", "Br"]
    assert _valid(ids, adj)


def test_benzene_kekulization():
    ids, adj = smiles_to_graph("c1ccccc1")
    assert len(ids) == 6
    orders = [adj[i, (i + 1) % 6] for i in range(6)]
    assert sorted(orders) == [1, 1, 1, 2, 2, 2]  # alternating
    # alternation: no two adjacent double bonds
    for i in range(6):
        assert not (orders[i] == 2 and orders[(i + 1) % 6] == 2)
    assert _valid(ids, adj)


def test_pyridine_and_pyrrole():
    # pyridine: aromatic N takes one double bond (valence 3)
    ids, adj = smiles_to_graph("c1ccncc1")
    n_idx = int(np.nonzero(ids == IDX["N"])[0][0])
    assert adj[n_idx].sum() == 3  # one single + one double
    assert _valid(ids, adj)
    # pyrrole: [nH] contributes the lone pair, takes NO double bond
    ids, adj = smiles_to_graph("c1cc[nH]c1")
    n_idx = int(np.nonzero(ids == IDX["N"])[0][0])
    assert adj[n_idx].sum() == 2  # two single bonds; H fills valence
    assert _valid(ids, adj)


def test_fused_aromatic_naphthalene():
    ids, adj = smiles_to_graph("c1ccc2ccccc2c1")
    assert len(ids) == 10
    # kekulized naphthalene has exactly 5 double bonds
    assert (np.triu(adj) == 2).sum() == 5
    assert _valid(ids, adj)


def test_bracket_atom_charge_parsing():
    atoms, bonds = parse_smiles("[NH4+]")
    assert atoms[0].element == "N" and atoms[0].charge == 1
    assert atoms[0].h_count == 4
    atoms, _ = parse_smiles("[O-2]")
    assert atoms[0].charge == -2
    atoms, _ = parse_smiles("[Fe++]")
    assert atoms[0].charge == 2


def test_charged_nitro_group():
    # nitromethane written in charge-separated form
    ids, adj = smiles_to_graph("C[N+](=O)[O-]")
    n_idx = int(np.nonzero(ids == IDX["N"])[0][0])
    assert adj[n_idx].sum() == 4  # N+ carries 4 bonds
    # NOTE: charge channel is collapsed -> neutral-N valency check fails;
    # that's the documented 9-type vocabulary collapse.


def test_out_of_vocab_returns_none():
    assert smiles_to_graph("[Si](C)(C)C") is None
    assert smiles_to_graph("[2H]O") is None   # explicit H out of vocab


def test_parse_failures():
    assert smiles_to_graph("C1CC") is None       # unclosed ring
    assert smiles_to_graph("C(C") is None        # unclosed branch
    assert smiles_to_graph("Xy") is None         # unknown atom
    assert smiles_to_graph("") is None
    with pytest.raises(SmilesError):
        parse_smiles("C1CC")


def test_stereo_markers_dropped():
    # L-alanine with stereo: parses, stereo collapsed to plain bonds
    ids, adj = smiles_to_graph("C[C@@H](C(=O)O)N")
    assert ids is not None
    assert _valid(ids, adj)


def test_duplicate_bond_rejected():
    # ring closure duplicating an explicit bond => None (adj conflict)
    assert smiles_to_graph("C12CC12") is None


def test_kekulization_failure_returns_none():
    # cyclopentadienyl-like odd aromatic carbocycle with no heteroatom
    # lone pair: no perfect matching exists
    assert smiles_to_graph("c1cccc1") is None


def test_preprocess_roundtrip(tmp_path):
    from experiments.molecule_generation.preprocess import preprocess
    lines = ["smiles id\n",               # header skipped
             "CCO mol1\n",
             "c1ccccc1 mol2\n",
             "C1CC not-closed\n",         # parse fail
             "CC.CC frag\n",              # disconnected
             "C" * 50 + " huge\n"]        # too large
    atoms, edges, counts, stats = preprocess(lines, max_nodes=12)
    assert stats == {"total": 5, "parse_fail": 1, "too_large": 1,
                     "disconnected": 1, "kept": 2}
    assert atoms.shape == (2, 12) and counts.tolist() == [3, 6]
    E = 12 * 11 // 2
    assert edges.shape == (2, E)
    # benzene row survives the validity check after padding
    mask = (np.arange(12) < 6)[None].astype(np.float32)
    assert chem.molecule_validity(atoms[1:2].astype(np.int64),
                                  edges[1:2].astype(np.int64), mask)[0]


def test_preprocess_synthetic_mode():
    from experiments.molecule_generation.preprocess import (preprocess,
                                                            synthesize_smiles)
    smi = synthesize_smiles(64, max_nodes=16, seed=3)
    atoms, edges, counts, stats = preprocess(smi, max_nodes=16)
    # lossless: every synthesized molecule survives its own ingestion
    assert stats["kept"] == 64 and stats["parse_fail"] == 0
    assert atoms.shape == (64, 16) and edges.shape == (64, 120)
    assert counts.max() <= 16
    mask = (np.arange(16)[None, :] < counts[:, None]).astype(np.float32)
    valid = chem.molecule_validity(atoms.astype(np.int64),
                                   edges.astype(np.int64), mask)
    assert valid.all()  # generator is valence-safe by construction


def test_graph_to_smiles_roundtrip():
    from categoricalnf_tpu.data.smiles import graph_to_smiles
    rng = np.random.default_rng(7)
    moses = lambda r, n: chem.zinc_like_molecule(r, n, leaf_style="moses")
    for style in (chem.zinc_like_molecule, moses, chem.random_molecule):
        for _ in range(50):
            a, adj = style(rng, int(rng.integers(2, 22)))
            out = smiles_to_graph(graph_to_smiles(a, adj))
            assert out is not None
            a2, adj2 = out
            n = len(a)
            assert len(a2) == n
            e1 = chem.dense_to_edges(adj)
            e2 = chem.dense_to_edges(adj2)
            assert (chem.wl_hash(a, e1, np.ones(n))
                    == chem.wl_hash(a2, e2, np.ones(n)))


def test_graph_to_smiles_fixed_cases():
    from categoricalnf_tpu.data.smiles import graph_to_smiles
    # single atom
    assert graph_to_smiles(np.array([0]), np.zeros((1, 1), int)) == "C"
    # double bond: C=O
    adj = np.array([[0, 2], [2, 0]])
    s = graph_to_smiles(np.array([0, 2]), adj)
    assert smiles_to_graph(s)[1][0, 1] == 2
    # disconnected components join with '.'
    adj = np.zeros((2, 2), int)
    assert "." in graph_to_smiles(np.array([0, 0]), adj)
    # ring closure digits emitted for cycles
    n = 6
    ring = np.zeros((n, n), int)
    for k in range(n):
        ring[k, (k + 1) % n] = ring[(k + 1) % n, k] = 1
    s = graph_to_smiles(np.zeros(n, int), ring)
    assert "1" in s and smiles_to_graph(s) is not None
