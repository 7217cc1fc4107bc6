"""Molecule generation task: GraphCNF on Zinc250k/Moses-format data.

Reference parity: ``experiments/molecule_generation/`` (SURVEY.md C26):
dataset loading, GraphCNF training, validity/uniqueness/novelty eval with
valency correction, categorical prior over node count.

Data: zero-egress environment — the loader reads a preprocessed
``{name}.npz`` from ``data_dir`` when present (arrays: ``atoms`` [M, N]
int8 atom-type ids, ``edges`` [M, E] int8 upper-tri bond orders,
``num_atoms`` [M]); otherwise it falls back to the synthetic
valence-correct generator in ``chem.py`` so the full pipeline stays
end-to-end testable.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu.models.graphcnf import GraphCNF
from categoricalnf_tpu.tasks import chem
from categoricalnf_tpu.training.task import TaskTemplate

LN2 = 0.6931471805599453


def load_molecule_dataset(name: str, data_dir: Optional[str],
                          max_nodes: int, synth_size: int = 4096,
                          seed: int = 0) -> dict:
    data_dir = data_dir or os.environ.get("CNF_DATA_DIR", "data")
    path = os.path.join(data_dir, f"{name}.npz")
    if os.path.exists(path):
        with np.load(path) as f:
            atoms, edges = f["atoms"], f["edges"]
            num_atoms = f["num_atoms"]
    else:
        # The in-memory random fallback exists ONLY for the explicit
        # synthetic name: a missing .npz for a NAMED dataset must fail
        # loudly, or a run/inference rebuild would silently train or be
        # re-measured on 4k random graphs while carrying the named
        # dataset's label (runs stamp the task name from ``name``).
        if name != "synthetic":
            raise FileNotFoundError(
                f"molecule dataset {name!r}: {path} not found — generate "
                "it with experiments/molecule_generation/preprocess.py "
                "or pass --dataset synthetic for the in-memory fallback")
        rng = np.random.default_rng(seed)
        E = max_nodes * (max_nodes - 1) // 2
        atoms = np.zeros((synth_size, max_nodes), np.int32)
        edges = np.zeros((synth_size, E), np.int32)
        num_atoms = rng.integers(8, max_nodes + 1, synth_size)
        for m in range(synth_size):
            n = int(num_atoms[m])
            a, adj = chem.random_molecule(rng, n)
            atoms[m, :n] = a
            full = np.zeros((max_nodes, max_nodes), np.int64)
            full[:n, :n] = adj
            edges[m] = chem.dense_to_edges(full)
    mask = (np.arange(max_nodes)[None, :]
            < num_atoms[:, None]).astype(np.float32)
    return {"atoms": atoms.astype(np.int32),
            "edges": edges.astype(np.int32),
            "node_mask": mask, "num_atoms": num_atoms.astype(np.int32)}


@dataclasses.dataclass
class MoleculeTask(TaskTemplate):
    dataset: str = "synthetic"
    data_dir: Optional[str] = None
    max_nodes: int = 24
    batch_size: int = 64
    num_layers_node: int = 4
    num_layers_edge: int = 4
    num_layers_bond: int = 0  # 0 = follow num_layers_edge
    hidden_dim: int = 96
    num_mixtures: int = 8
    edge_degree_norm: str = "nodes"
    bond_cond_exist: bool = False
    node_cond_atoms: bool = False
    bond_cond_degree: bool = False
    eval_batches_count: int = 8
    metric_samples: int = 1024
    synth_size: int = 2048
    compute_dtype: str = "float32"
    name: str = "molecule_generation"

    def __post_init__(self):
        self.data = load_molecule_dataset(self.dataset, self.data_dir,
                                          self.max_nodes, self.synth_size)
        self.name = f"molecules_{self.dataset}"
        self.model = GraphCNF(
            num_atom_types=len(chem.ATOM_TYPES), num_bond_types=3,
            max_nodes=self.max_nodes,
            num_layers_node=self.num_layers_node,
            num_layers_edge=self.num_layers_edge,
            num_layers_bond=self.num_layers_bond,
            hidden_dim=self.hidden_dim, num_mixtures=self.num_mixtures,
            edge_degree_norm=self.edge_degree_norm,
            bond_cond_exist=self.bond_cond_exist,
            node_cond_atoms=self.node_cond_atoms,
            bond_cond_degree=self.bond_cond_degree,
            compute_dtype=self.compute_dtype)
        # categorical prior over node count (+1 smoothing)
        counts = np.bincount(self.data["num_atoms"],
                             minlength=self.max_nodes + 1).astype(np.float64)
        counts += 1.0
        self._logp_n = np.log(counts / counts.sum())
        ntrain = int(0.9 * len(self.data["atoms"]))
        self._split = ntrain
        self._train_hashes = None  # built lazily for novelty

    # -- data -------------------------------------------------------------

    def _slice(self, idx) -> dict:
        return {"atoms": self.data["atoms"][idx],
                "edges": self.data["edges"][idx],
                "node_mask": self.data["node_mask"][idx]}

    def train_batches(self, rng: np.random.Generator) -> Iterator[dict]:
        while True:
            idx = rng.integers(0, self._split, self.batch_size)
            yield self._slice(idx)

    def eval_batches(self) -> list[dict]:
        rng = np.random.default_rng(5)
        out = []
        for _ in range(self.eval_batches_count):
            idx = rng.integers(self._split, len(self.data["atoms"]),
                               self.batch_size)
            out.append(self._slice(idx))
        return out

    # -- objective (overrides: different batch structure) ------------------

    def loss(self, params, batch, rng, beta):
        return self.model.loss_bpd(params, batch["atoms"], batch["edges"],
                                   batch["node_mask"], rng, beta)

    def eval_step(self, params, batch, rng, num_samples):
        bpd = self.eval_model.eval_bpd(params, batch["atoms"],
                                       batch["edges"], batch["node_mask"],
                                       rng, num_samples)
        return bpd + self.eval_bpd_extra(batch)

    def elbo(self, params, batch, rng):
        return self.eval_model.elbo(params, batch["atoms"], batch["edges"],
                                    batch["node_mask"], rng)["elbo"]

    def num_vars(self, batch):
        n = jnp.asarray(batch["node_mask"], jnp.float32).sum(-1)
        return n + self.model.edge_mask(batch["node_mask"]).sum(-1)

    def eval_bpd_extra(self, batch):
        # categorical node-count prior enters the likelihood additively
        n = jnp.asarray(batch["node_mask"], jnp.float32).sum(-1)
        logp_n = jnp.asarray(self._logp_n, jnp.float32)[n.astype(jnp.int32)]
        return -logp_n / (self.num_vars(batch) * LN2)

    def init_params(self, rng):
        return self.model.init(rng)

    def data_init(self, params, batch, rng):
        return self.model.data_init(params, batch["atoms"], batch["edges"],
                                    batch["node_mask"], rng)

    # -- sampling / metrics ------------------------------------------------

    def sample_node_mask(self, rng: np.random.Generator,
                         batch: int) -> np.ndarray:
        p = np.exp(self._logp_n)
        counts = rng.choice(len(p), size=batch, p=p / p.sum())
        counts = np.maximum(counts, 1)
        return (np.arange(self.max_nodes)[None, :]
                < counts[:, None]).astype(np.float32)

    # sample_eval may pass per-stage "t_node:t_exist:t_bond" temperatures
    supports_stage_temperatures = True

    def sample_many(self, params, rng: jax.Array, num_samples: int,
                    temperature=1.0
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched jitted sampling loop -> (atoms, edges, node_mask) with
        ``num_samples`` rows (reference evaluates on 10k samples; VERDICT
        r1 #6 requires CI-sized sample statistics)."""
        # temperature rides as a TRACED length-3 vector (scalar inputs
        # broadcast; "a:b:c" per-stage inputs from sample_eval arrive as
        # tuples) so any sweep reuses ONE compiled executable instead of
        # recompiling the whole sampling graph per temperature (5-10 min
        # each through the TPU tunnel).
        sample_fn = jax.jit(lambda p, k, m, t: self.model.sample(
            p, k, m, temperature=t))
        temps = np.broadcast_to(
            np.asarray(temperature, np.float32).reshape(-1), (3,))
        np_rng = np.random.default_rng(int(jax.random.randint(
            rng, (), 0, 2**31 - 1)))
        chunks_a, chunks_e, chunks_m = [], [], []
        done = 0
        i = 0
        while done < num_samples:
            b = min(self.batch_size, num_samples - done)
            node_mask = self.sample_node_mask(np_rng, self.batch_size)
            atoms, edges = sample_fn(params, jax.random.fold_in(rng, i),
                                     jnp.asarray(node_mask),
                                     jnp.asarray(temps))
            chunks_a.append(np.asarray(atoms)[:b])
            chunks_e.append(np.asarray(edges)[:b])
            chunks_m.append(node_mask[:b])
            done += b
            i += 1
        return (np.concatenate(chunks_a), np.concatenate(chunks_e),
                np.concatenate(chunks_m))

    def sample_metrics(self, params, rng: jax.Array,
                       num_samples: Optional[int] = None,
                       temperature=1.0) -> dict:
        num_samples = num_samples or self.metric_samples
        atoms, edges, node_mask = self.sample_many(params, rng, num_samples,
                                                   temperature)
        if self._train_hashes is None:
            d = self._slice(np.arange(self._split))
            self._train_hashes = {
                chem.wl_hash(d["atoms"][i], d["edges"][i],
                             d["node_mask"][i])
                for i in range(len(d["atoms"]))}
        # Reference-comparable raw validity: valence-only, fragments
        # allowed — the RDKit-sanitization criterion the reference's
        # numbers use (see chem.molecule_validity).  The strict
        # single-connected-molecule definition is reported alongside.
        raw = chem.sample_quality(atoms, edges, node_mask,
                                  self._train_hashes, correct=False,
                                  check_connected=False)
        strict = chem.sample_quality(atoms, edges, node_mask,
                                     self._train_hashes, correct=False,
                                     check_connected=True)
        fixed = chem.sample_quality(atoms, edges, node_mask,
                                    self._train_hashes, correct=True)
        n = float(len(atoms))
        p = raw["validity"]
        return {"validity": p,
                # binomial 95% CI half-width at this sample size
                "validity_ci95": float(1.96 * np.sqrt(max(p * (1 - p), 0.0)
                                                      / n)),
                "uniqueness": raw["uniqueness"],
                "novelty": raw.get("novelty", 0.0),
                "validity_strict": strict["validity"],
                "validity_corrected": fixed["validity"],
                "uniqueness_corrected": fixed["uniqueness"],
                "novelty_corrected": fixed.get("novelty", 0.0),
                "metric_num_samples": n}

    def sample_artifacts(self, params, rng, out_dir: str) -> None:
        """Dump sampled molecules as JSON (atoms, bonds, validity)."""
        import json
        import os
        np_rng = np.random.default_rng(0)
        node_mask = self.sample_node_mask(np_rng, 32)
        atoms, edges = self.model.sample(params, rng,
                                         jnp.asarray(node_mask))
        atoms, edges = np.asarray(atoms), np.asarray(edges)
        valid = chem.molecule_validity(atoms, edges, node_mask,
                                       check_connected=False)
        valid_strict = chem.molecule_validity(atoms, edges, node_mask)
        from categoricalnf_tpu.data.smiles import graph_to_smiles
        out = []
        for b in range(32):
            k = int(node_mask[b].sum())
            adj = chem.edges_to_dense(edges[b], self.max_nodes)[:k, :k]
            bonds = [[int(i), int(j), int(adj[i, j])]
                     for i in range(k) for j in range(i + 1, k)
                     if adj[i, j] > 0]
            out.append({"atoms": [chem.ATOM_TYPES[a]
                                  for a in atoms[b, :k]],
                        "bonds": bonds, "valid": bool(valid[b]),
                        "valid_strict": bool(valid_strict[b]),
                        # reference parity: RDKit MolToSmiles on samples
                        "smiles": graph_to_smiles(atoms[b, :k], adj)})
        with open(os.path.join(out_dir, "sampled_molecules.json"), "w") as f:
            json.dump(out, f, indent=1)
