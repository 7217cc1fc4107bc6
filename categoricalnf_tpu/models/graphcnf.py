"""GraphCNF: three-step flow for molecule generation (paper §4.3).

Reference parity: the GraphCNF assembly in
``experiments/molecule_generation/`` (SURVEY.md C17).  Three latent
streams with a generation-consistent conditioning order:

  1. **node types**   z_v  [B, N, Dv]  — couplings with permutation-
     equivariant attention over nodes (no structure exists yet when
     sampling nodes first);
  2. **edge existence** z_e1 [B, E, D1] (E = N(N-1)/2 upper-tri pairs,
     categories {virtual, real}) — EdgeGNN couplings conditioned on the
     data-side node latents z_v;
  3. **bond types**   z_e2 [B, E, D2] (single/double/triple; positions of
     virtual edges are masked) — EdgeGNN couplings conditioned on z_v and
     on the existence latents z_e1 as extra edge features.

All conditioning uses *data-side* latents, which are available identically
in the density direction (forward) and the sampling direction (inverse) —
that is what makes the three-step factorisation invertible.  Variable
graph size is handled with node masks everywhere plus a categorical prior
over node count (owned by the task; SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu import flows
from categoricalnf_tpu.encodings.mixture import MixtureEncoding
from categoricalnf_tpu.models.categorical_flow import LN2
from categoricalnf_tpu.networks.graph import EdgeGNN, pair_indices
from categoricalnf_tpu.networks.transformer import SetTransformer

Array = jax.Array


def _stacked(sub, num_layers: int, scan_blocks: bool = True):
    if scan_blocks and num_layers % 2 == 0 and num_layers >= 4:
        # remat: the graph coupling nets are the framework's memory-
        # hungriest (B×E×hidden GNN activations per block); recomputing
        # them in backward keeps scaled configs inside a v5e's HBM.
        return flows.FlowModel(
            layers=(flows.ScannedBlocks(block=sub(0) + sub(1),
                                        depth=num_layers // 2,
                                        remat=True),),
            prior=flows.LogisticPrior())
    layers = []
    for i in range(num_layers):
        layers.extend(sub(i % 2))
    return flows.FlowModel(layers=tuple(layers), prior=flows.LogisticPrior())


def build_node_flow(dim: int, num_layers: int, hidden_dim: int,
                    num_mixtures: int, compute_dtype: str):
    net = SetTransformer(hidden_dim=hidden_dim, num_heads=4, num_layers=2,
                         compute_dtype=compute_dtype)

    def sub(parity):
        return (flows.ActNorm(), flows.InvertibleLinear(),
                flows.MixtureCDFCoupling(net=net, mask_kind="channel",
                                         parity=parity,
                                         num_mixtures=num_mixtures),
                flows.SoftClamp())

    return _stacked(sub, num_layers)


def build_edge_flow(dim: int, max_nodes: int,
                    edge_feat_dim: int, num_layers: int, hidden_dim: int,
                    num_mixtures: int, compute_dtype: str,
                    degree_norm: str = "nodes"):
    # NOTE: the node-conditioning width is NOT baked in here — it flows in
    # via flow.init(event_dim, cond_dim) from GraphCNF._cond_node_dim.
    net = EdgeGNN(num_nodes=max_nodes, hidden_dim=hidden_dim,
                  num_layers=2, edge_feat_dim=edge_feat_dim,
                  degree_norm=degree_norm,
                  compute_dtype=compute_dtype)

    def sub(parity):
        return (flows.ActNorm(), flows.InvertibleLinear(),
                flows.MixtureCDFCoupling(net=net, mask_kind="channel",
                                         parity=parity,
                                         num_mixtures=num_mixtures),
                flows.SoftClamp())

    return _stacked(sub, num_layers)


@dataclasses.dataclass(frozen=True)
class GraphCNF:
    num_atom_types: int = 9
    num_bond_types: int = 3      # single/double/triple (virtual separate)
    max_nodes: int = 38
    node_dim: int = 6
    exist_dim: int = 2
    bond_dim: int = 3
    num_layers_node: int = 4
    num_layers_edge: int = 4
    # Bond-stage depth, independent of the exist stage (0 = follow
    # num_layers_edge).  Round-3 lever for the diagnosed stage-3
    # double-bond deficit: the bond flow under-allocates prior mass to
    # the double-bond mode (~8-10% sampled vs ~21% in data; RESULTS.md
    # diagnostics), and the exist stage does not need the extra depth.
    num_layers_bond: int = 0
    hidden_dim: int = 96
    num_mixtures: int = 8
    # Round-2 conditioning levers (default off for checkpoint compat; all
    # are deterministic functions of latents/labels available identically
    # in both directions, so density/sampling consistency is preserved —
    # tests/test_mask_integrity.py).  CPU A/B outcomes (RESULTS.md):
    # edge_degree_norm="live_edges" normalises EdgeGNN edge→node messages
    # by the live-edge degree instead of N_live−1 — measured HARMFUL at
    # fixed LR (the ~3-8× message rescale changes the optimization
    # scale); kept for completeness, leave off.
    edge_degree_norm: str = "nodes"
    # bond_cond_exist: decoded existence one-hots as bond-stage edge
    # features — measured NEUTRAL, and structurally near-useless: exist
    # ≡ 1 on every position the bond flow transforms (the mask already
    # encodes it) and virtual-edge features never pass the emask-gated
    # message passing.  Superseded by bond_cond_degree.
    bond_cond_exist: bool = False
    # node_cond_atoms=True conditions stages 2-3 on the DECODED atom-type
    # one-hots alongside z_v (atoms decode before stage 2 when sampling;
    # data labels in the density direction) — chemistry is
    # atom-type-driven, and the GNN's linear embeddings recover the type
    # from the 6-d latent only weakly.  Measured +3.0 pts validity alone,
    # +7.2 pts composed with bond_cond_degree.
    node_cond_atoms: bool = False
    # bond_cond_degree=True conditions the BOND stage's node stream on the
    # one-hot decoded degree (count of existing edges per node, clipped at
    # 5) — the node's remaining valence budget, which directly governs how
    # many double/triple bonds it can take (the diagnosed valence-excess
    # failure mode).  Measured +2.1 pts validity alone, +7.2 composed
    # with node_cond_atoms (the round-3 default pair).
    bond_cond_degree: bool = False
    compute_dtype: str = "float32"

    @property
    def num_edges(self) -> int:
        return self.max_nodes * (self.max_nodes - 1) // 2

    # static sub-modules -------------------------------------------------

    @property
    def enc_node(self):
        return MixtureEncoding(num_categories=self.num_atom_types,
                               dim=self.node_dim)

    @property
    def enc_exist(self):
        return MixtureEncoding(num_categories=2, dim=self.exist_dim)

    @property
    def enc_bond(self):
        return MixtureEncoding(num_categories=self.num_bond_types,
                               dim=self.bond_dim)

    @property
    def flow_node(self):
        return build_node_flow(self.node_dim, self.num_layers_node,
                               self.hidden_dim, self.num_mixtures,
                               self.compute_dtype)

    @property
    def flow_exist(self):
        return build_edge_flow(self.exist_dim, self.max_nodes,
                               0, self.num_layers_edge, self.hidden_dim,
                               self.num_mixtures, self.compute_dtype,
                               degree_norm=self.edge_degree_norm)

    @property
    def flow_bond(self):
        feat = self.exist_dim + (2 if self.bond_cond_exist else 0)
        return build_edge_flow(self.bond_dim, self.max_nodes,
                               feat,
                               self.num_layers_bond or self.num_layers_edge,
                               self.hidden_dim, self.num_mixtures,
                               self.compute_dtype,
                               degree_norm=self.edge_degree_norm)

    @property
    def _cond_node_dim(self) -> int:
        return self.node_dim + (self.num_atom_types if self.node_cond_atoms
                                else 0)

    @property
    def _bond_cond_node_dim(self) -> int:
        return self._cond_node_dim + (6 if self.bond_cond_degree else 0)

    def _node_feat(self, z_v: Array, atoms: Array, node_mask: Array) -> Array:
        """Stage-2/3 node conditioning: z_v (+ decoded-atom one-hots).

        ``atoms`` is the data labels in the density direction and the
        decoded stage-1 output at sampling — identical by construction for
        the graph the sample realises.  One-hots are gated by node_mask so
        padded nodes carry zero features in both directions.
        """
        if not self.node_cond_atoms:
            return z_v
        oh = jax.nn.one_hot(atoms, self.num_atom_types, dtype=jnp.float32)
        oh = oh * jnp.asarray(node_mask, jnp.float32)[..., None]
        return jnp.concatenate([jnp.asarray(z_v, jnp.float32), oh], axis=-1)

    def _bond_node_feat(self, node_feat: Array, exist: Array,
                        e_mask: Array, node_mask: Array) -> Array:
        """Bond-stage node conditioning: stage-2/3 features (+ decoded
        degree one-hot).  ``exist`` is data labels in the density
        direction and the decoded stage-2 output at sampling."""
        if not self.bond_cond_degree:
            return node_feat
        from categoricalnf_tpu.networks.graph import incidence_matrix
        inc = incidence_matrix(self.max_nodes)           # [E, N]
        live = (jnp.asarray(exist, jnp.float32)
                * jnp.asarray(e_mask, jnp.float32))      # [B, E]
        deg = jnp.einsum("en,be->bn", inc, live)         # [B, N]
        oh = jax.nn.one_hot(jnp.clip(deg, 0, 5).astype(jnp.int32), 6,
                            dtype=jnp.float32)
        oh = oh * jnp.asarray(node_mask, jnp.float32)[..., None]
        return jnp.concatenate([node_feat, oh], axis=-1)

    def _bond_edge_feat(self, z_e1: Array, exist: Array,
                        e_mask: Array) -> Array:
        """Bond-stage conditioning features: z_e1 (+ decoded-exist one-hot).

        ``exist`` is the data labels in the density direction and the
        decoded stage-2 output at sampling — identical by construction for
        the graph the sample realises.  The one-hot is gated by e_mask so
        padded pairs carry the same (zero) features in both directions.
        """
        if not self.bond_cond_exist:
            return z_e1
        oh = jax.nn.one_hot(exist, 2, dtype=jnp.float32)
        oh = oh * jnp.asarray(e_mask, jnp.float32)[..., None]
        return jnp.concatenate([jnp.asarray(z_e1, jnp.float32), oh], axis=-1)

    def init(self, rng: jax.Array):
        ks = jax.random.split(rng, 6)
        return {
            "enc_node": self.enc_node.init(ks[0]),
            "enc_exist": self.enc_exist.init(ks[1]),
            "enc_bond": self.enc_bond.init(ks[2]),
            "flow_node": self.flow_node.init(ks[3], self.node_dim, 0),
            "flow_exist": self.flow_exist.init(ks[4], self.exist_dim,
                                               self._cond_node_dim),
            "flow_bond": self.flow_bond.init(ks[5], self.bond_dim,
                                             self._bond_cond_node_dim),
        }

    # masks ---------------------------------------------------------------

    def edge_mask(self, node_mask: Array) -> Array:
        ii, jj = pair_indices(self.max_nodes)
        return node_mask[:, ii] * node_mask[:, jj]

    # objective -----------------------------------------------------------

    def elbo(self, params, atoms: Array, edges: Array, node_mask: Array,
             rng: jax.Array) -> dict:
        """atoms [B,N] in {0..A-1}; edges [B,E] in {0=virtual,1..R=bond}."""
        k1, k2, k3 = jax.random.split(rng, 3)
        e_mask = self.edge_mask(node_mask)
        exist = (edges > 0).astype(jnp.int32)
        bond = jnp.maximum(edges - 1, 0)
        bond_mask = e_mask * exist.astype(jnp.float32)

        # encode
        z_v, lq_v = self.enc_node.encode(params["enc_node"], atoms, k1,
                                         mask=node_mask)
        z_e1, lq_e1 = self.enc_exist.encode(params["enc_exist"], exist, k2,
                                            mask=e_mask)
        z_e2, lq_e2 = self.enc_bond.encode(params["enc_bond"], bond, k3,
                                           mask=bond_mask)

        # flow log-probs (three stages, generation-consistent conds)
        lp_v = self.flow_node.log_prob(params["flow_node"], z_v,
                                       mask=node_mask)
        node_feat = self._node_feat(z_v, atoms, node_mask)
        cond_e1 = {"node_feat": node_feat, "node_mask": node_mask}
        lp_e1 = self.flow_exist.log_prob(params["flow_exist"], z_e1,
                                         cond=cond_e1, mask=e_mask)
        cond_e2 = {"node_feat": self._bond_node_feat(node_feat, exist,
                                                     e_mask, node_mask),
                   "node_mask": node_mask,
                   "edge_feat": self._bond_edge_feat(z_e1, exist, e_mask)}
        lp_e2 = self.flow_bond.log_prob(params["flow_bond"], z_e2,
                                        cond=cond_e2, mask=bond_mask)

        # decoders (Bayes posteriors)
        ld_v = self.enc_node.log_decoder(params["enc_node"], atoms, z_v,
                                         mask=node_mask)
        ld_e1 = self.enc_exist.log_decoder(params["enc_exist"], exist, z_e1,
                                           mask=e_mask)
        ld_e2 = self.enc_bond.log_decoder(params["enc_bond"], bond, z_e2,
                                          mask=bond_mask)

        elbo = (lp_v + lp_e1 + lp_e2 + ld_v + ld_e1 + ld_e2
                - lq_v - lq_e1 - lq_e2)
        return {"elbo": elbo,
                "log_p": lp_v + lp_e1 + lp_e2,
                "log_dec": ld_v + ld_e1 + ld_e2,
                "log_q": lq_v + lq_e1 + lq_e2}

    def loss_bpd(self, params, atoms, edges, node_mask, rng,
                 beta: float | Array = 1.0) -> Array:
        parts = self.elbo(params, atoms, edges, node_mask, rng)
        obj = parts["log_p"] + parts["log_dec"] - beta * parts["log_q"]
        n_vars = (node_mask.sum(-1)
                  + self.edge_mask(node_mask).sum(-1))
        loss = jnp.mean(-obj / (n_vars * LN2))
        # positive-ELBO guard (see CategoricalFlow.loss_bpd)
        elbo = parts["log_p"] + parts["log_dec"] - parts["log_q"]
        cheat = jax.nn.relu(jnp.mean(elbo / (n_vars * LN2)))
        return loss + 10.0 * cheat * cheat

    def iw_log_prob(self, params, atoms, edges, node_mask, rng,
                    num_samples: int) -> Array:
        keys = jax.random.split(rng, num_samples)
        one = lambda k: self.elbo(params, atoms, edges, node_mask,
                                  k)["elbo"]
        # chunked chains (see CategoricalFlow.iw_log_prob): large IS
        # counts stay within the chunk's working set
        chunk = num_samples if num_samples % 16 else 16
        if num_samples <= chunk:
            elbos = jax.vmap(one)(keys)
        else:
            elbos = jax.lax.map(
                jax.vmap(one),
                keys.reshape(num_samples // chunk, chunk,
                             *keys.shape[1:])).reshape(num_samples, -1)
        return (jax.scipy.special.logsumexp(elbos, axis=0)
                - jnp.log(float(num_samples)))

    def eval_bpd(self, params, atoms, edges, node_mask, rng,
                 num_samples: int = 1) -> Array:
        ll = self.iw_log_prob(params, atoms, edges, node_mask, rng,
                              num_samples)
        n_vars = node_mask.sum(-1) + self.edge_mask(node_mask).sum(-1)
        return -ll / (n_vars * LN2)

    # sampling ------------------------------------------------------------

    def sample(self, params, rng: jax.Array, node_mask: Array,
               temperature: float = 1.0) -> tuple[Array, Array]:
        """Ancestral sampling given a node mask (node count drawn by task).

        Returns (atoms [B,N], edges [B,E] with 0=virtual/1..R=bond type).
        ``temperature`` scales the prior draws: a scalar applies to all
        three stages; a length-3 vector ``(t_node, t_exist, t_bond)``
        sets each stage separately (the existence-stage temperature
        controls sampled edge density — the fragmentation/valence
        trade-off the failure-mode diagnostics isolate — independently
        of node- and bond-type concentration).  Traced either way, so a
        sweep reuses one compiled executable.
        """
        B = node_mask.shape[0]
        temps = jnp.broadcast_to(
            jnp.asarray(temperature, jnp.float32).reshape(-1), (3,))
        k1, k2, k3 = jax.random.split(rng, 3)
        e_mask = self.edge_mask(node_mask)

        # stage 1: nodes
        zp_v = self.flow_node.prior.sample(k1, (B, self.max_nodes,
                                                self.node_dim), temps[0])
        z_v, _ = self.flow_node.inverse(params["flow_node"], zp_v,
                                        mask=node_mask)
        atoms = self.enc_node.decode(params["enc_node"], z_v)

        # stage 2: edge existence | node latents
        zp_e1 = self.flow_exist.prior.sample(k2, (B, self.num_edges,
                                                  self.exist_dim),
                                             temps[1])
        node_feat = self._node_feat(z_v, atoms, node_mask)
        cond_e1 = {"node_feat": node_feat, "node_mask": node_mask}
        z_e1, _ = self.flow_exist.inverse(params["flow_exist"], zp_e1,
                                          cond=cond_e1, mask=e_mask)
        exist = self.enc_exist.decode(params["enc_exist"], z_e1)

        # stage 3: bond types | node + existence latents.  The density
        # direction (elbo) evaluates the bond flow with
        # bond_mask = e_mask * exist — only *existing* edges participate;
        # EdgeGNN gates every read of the edge stream by this mask.  The
        # inverse must use the SAME mask or the coupling nets condition
        # real-edge transforms on virtual-edge prior noise the trained
        # density never saw (the sampling-side twin of the masked-leak bug;
        # see tests/test_mask_integrity.py::test_bond_gating_consistency).
        bond_mask = e_mask * exist.astype(jnp.float32)
        zp_e2 = self.flow_bond.prior.sample(k3, (B, self.num_edges,
                                                 self.bond_dim), temps[2])
        cond_e2 = {"node_feat": self._bond_node_feat(node_feat, exist,
                                                     e_mask, node_mask),
                   "node_mask": node_mask,
                   "edge_feat": self._bond_edge_feat(z_e1, exist, e_mask)}
        z_e2, _ = self.flow_bond.inverse(params["flow_bond"], zp_e2,
                                         cond=cond_e2, mask=bond_mask)
        bond = self.enc_bond.decode(params["enc_bond"], z_e2)

        edges = exist * (1 + bond)
        edges = (edges * e_mask).astype(jnp.int32)
        atoms = (atoms * node_mask).astype(jnp.int32)
        return atoms, edges

    # data-dependent init -------------------------------------------------

    def data_init(self, params, atoms, edges, node_mask, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        e_mask = self.edge_mask(node_mask)
        exist = (edges > 0).astype(jnp.int32)
        bond = jnp.maximum(edges - 1, 0)
        bond_mask = e_mask * exist.astype(jnp.float32)
        z_v, _ = self.enc_node.encode(params["enc_node"], atoms, k1,
                                      mask=node_mask)
        z_e1, _ = self.enc_exist.encode(params["enc_exist"], exist, k2,
                                        mask=e_mask)
        z_e2, _ = self.enc_bond.encode(params["enc_bond"], bond, k3,
                                       mask=bond_mask)
        params = dict(params)
        params["flow_node"] = self.flow_node.data_init(
            params["flow_node"], z_v, mask=node_mask)
        node_feat = self._node_feat(z_v, atoms, node_mask)
        params["flow_exist"] = self.flow_exist.data_init(
            params["flow_exist"], z_e1,
            cond={"node_feat": node_feat, "node_mask": node_mask},
            mask=e_mask)
        params["flow_bond"] = self.flow_bond.data_init(
            params["flow_bond"], z_e2,
            cond={"node_feat": self._bond_node_feat(node_feat, exist,
                                                    e_mask, node_mask),
                  "node_mask": node_mask,
                  "edge_feat": self._bond_edge_feat(z_e1, exist, e_mask)},
            mask=bond_mask)
        return params
