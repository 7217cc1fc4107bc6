"""Graph coupling networks: relational GCN and Edge-GNN.

Reference parity: ``layers/networks/graph_layers.py`` (SURVEY.md C16).
TPU-native design: adjacency is kept DENSE — [B, N, N] (untyped) or
[B, N, N, R] (typed relations) — so message passing is batched einsums on
the MXU instead of gather/scatter (molecule graphs have N ≤ ~40, so N²
tensors are tiny; dense is strictly faster on TPU than sparse indexing).

Conditioning protocol: these nets receive ``cond`` as a dict PyTree, e.g.
``{"adj": [B,N,N]}`` or ``{"adj_r": [B,N,N,R]}``; the coupling layers pass
it through untouched.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from categoricalnf_tpu.networks.common import dense, dense_init, layer_norm

Array = jax.Array


def _norm_adj(adj: Array, mask=None) -> Array:
    """Symmetric degree normalisation Â = D^-1/2 (A) D^-1/2, masked."""
    adj = jnp.asarray(adj, jnp.float32)
    if mask is not None:
        m = jnp.asarray(mask, jnp.float32)
        adj = adj * m[:, :, None] * m[:, None, :]
    deg = adj.sum(-1)
    inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1e-6))
    return adj * inv_sqrt[:, :, None] * inv_sqrt[:, None, :]


@dataclasses.dataclass(frozen=True)
class RGCN:
    """Relational GCN over node features, conditioned on (typed) adjacency.

    cond: {"adj": [B,N,N]} or {"adj_r": [B,N,N,R]} (one-hot relations).
    """

    hidden_dim: int = 96
    num_layers: int = 3
    num_relations: int = 1
    compute_dtype: str = "float32"

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    def init(self, rng, in_dim: int, out_dim: int, cond_dim: int = 0):
        h = self.hidden_dim
        ks = jax.random.split(rng, 2 + self.num_layers)
        params = {"embed": dense_init(ks[0], in_dim, h),
                  "out": dense_init(ks[1], h, out_dim, zero=True),
                  "blocks": []}
        for i in range(self.num_layers):
            bk = jax.random.split(ks[2 + i], 2 + self.num_relations)
            params["blocks"].append({
                "self": dense_init(bk[0], h, h, scale=0.5),
                "rel": [dense_init(bk[1 + r], h, h, scale=0.5)
                        for r in range(self.num_relations)],
                "mlp": dense_init(bk[-1], h, h, scale=0.5),
            })
        return params

    def _adjs(self, cond, mask):
        if "adj_r" in cond:
            a = jnp.asarray(cond["adj_r"], jnp.float32)
            return [_norm_adj(a[..., r], mask)
                    for r in range(self.num_relations)]
        return [_norm_adj(cond["adj"], mask)] * self.num_relations

    def apply(self, params, x, cond=None, mask=None):
        adjs = self._adjs(cond, mask)
        h = dense(params["embed"], jnp.asarray(x, jnp.float32), self._dtype)
        for bp in params["blocks"]:
            hn = layer_norm(h)
            msg = dense(bp["self"], hn, self._dtype)
            for a, wp in zip(adjs, bp["rel"]):
                neigh = jnp.einsum("bij,bjh->bih", a.astype(self._dtype),
                                   hn.astype(self._dtype),
                                   preferred_element_type=jnp.float32)
                msg = msg + dense(wp, neigh, self._dtype)
            h = h + jax.nn.gelu(msg)
            h = h + dense(bp["mlp"], jax.nn.gelu(layer_norm(h)), self._dtype)
        if mask is not None:
            h = h * jnp.asarray(mask, h.dtype)[..., None]
        return dense(params["out"], h, self._dtype)


def pair_indices(n: int):
    """Static upper-triangular pair index arrays (i<j) of length E."""
    import numpy as np
    iu = np.triu_indices(n, k=1)
    return jnp.asarray(iu[0], jnp.int32), jnp.asarray(iu[1], jnp.int32)


def incidence_matrix(n: int) -> Array:
    """Static [E, N] 0/1 incidence: row e has ones at its two endpoints.

    Edge-to-node aggregation becomes ``einsum('en,beh->bnh', Inc, msgs)``
    — an MXU matmul instead of a scatter-add (the TPU-native pattern for
    small dense graphs)."""
    import numpy as np
    iu = np.triu_indices(n, k=1)
    E = len(iu[0])
    inc = np.zeros((E, n), np.float32)
    inc[np.arange(E), iu[0]] = 1.0
    inc[np.arange(E), iu[1]] = 1.0
    return jnp.asarray(inc)


@dataclasses.dataclass(frozen=True)
class EdgeGNN:
    """Joint node+edge message passing; input/outputs are EDGE features.

    Operates on the flattened upper-triangular edge stream [B, E, C]
    (E = N(N-1)/2).  Internally scatters edges into the dense [B, N, N]
    picture with static indices, runs node<->edge updates as einsums, and
    reads the transform parameters back off the edges.

    cond: {"node_feat": [B, N, C_v]} plus optional {"node_mask": [B, N]}.
    Used by GraphCNF's edge stages (SURVEY.md C17).
    """

    num_nodes: int = 0  # static N (padded)
    hidden_dim: int = 96
    num_layers: int = 3
    edge_feat_dim: int = 0  # extra edge features from cond["edge_feat"]
    # Edge→node aggregation normaliser.  "nodes": divide by N_live−1 (the
    # dense-graph degree) — correct for the existence stage, where every
    # live node pair is a live edge.  "live_edges": divide by the node's
    # LIVE-edge count incᵀ·emask — in the bond stage only the ~2–4
    # existing bonds per node are live, so "nodes" under-scales messages
    # ~5× (diagnosed round 2: systematic double-bond undersampling).  The
    # two coincide whenever the transform mask equals the full pair mask.
    degree_norm: str = "nodes"
    compute_dtype: str = "float32"

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    def init(self, rng, in_dim: int, out_dim: int, cond_dim: int = 0):
        h = self.hidden_dim
        ks = jax.random.split(rng, 3 + self.num_layers)
        params = {"embed_e": dense_init(ks[0], in_dim + self.edge_feat_dim,
                                        h),
                  "embed_v": dense_init(ks[1], cond_dim if cond_dim else 1, h),
                  "out": dense_init(ks[2], h, out_dim, zero=True),
                  "blocks": []}
        for i in range(self.num_layers):
            bk = jax.random.split(ks[3 + i], 4)
            params["blocks"].append({
                "v2e": dense_init(bk[0], 2 * h, h, scale=0.5),
                "e2v": dense_init(bk[1], h, h, scale=0.5),
                "v_mlp": dense_init(bk[2], h, h, scale=0.5),
                "e_mlp": dense_init(bk[3], h, h, scale=0.5),
            })
        return params

    def apply(self, params, x, cond=None, mask=None):
        """x: [B, E, C_e] edge stream; returns [B, E, out_dim].

        ``mask`` is the TRANSFORM's validity mask over edge positions and
        MUST gate every read of ``x``: positions outside it are excluded
        from the density, so letting their z-values influence valid
        positions creates an unpaid noise side-channel the optimizer
        exploits (caught by valid-submap Jacobian forensics: +44 nats of
        fake ldj and a sign flip in the bond stage).
        """
        B, E, _ = x.shape
        n = self.num_nodes
        ii, jj = pair_indices(n)
        node_feat = jnp.asarray(cond["node_feat"], jnp.float32)
        node_mask = cond.get("node_mask") if cond else None

        vmask = (jnp.asarray(node_mask, jnp.float32) if node_mask is not None
                 else jnp.ones((B, n), jnp.float32))
        emask = vmask[:, ii] * vmask[:, jj]           # [B, E]
        if mask is not None:
            emask = emask * jnp.asarray(mask, jnp.float32)

        x = jnp.asarray(x, jnp.float32) * emask[..., None]
        if self.edge_feat_dim:
            # conditioning features are modeled latents — not masked
            x = jnp.concatenate(
                [x, jnp.asarray(cond["edge_feat"], jnp.float32)], axis=-1)
        he = dense(params["embed_e"], x, self._dtype)  # [B, E, H]
        hv = dense(params["embed_v"], node_feat, self._dtype)  # [B, N, H]

        for bp in params["blocks"]:
            hv_n, he_n = layer_norm(hv), layer_norm(he)
            # edge update: edge + its endpoints
            ends = jnp.concatenate([hv_n[:, ii], hv_n[:, jj]], axis=-1)
            he = he + jax.nn.gelu(dense(bp["v2e"], ends, self._dtype)
                                  + he_n) * emask[..., None]
            # node update: incidence-matmul aggregation (MXU, no scatter)
            he_m = dense(bp["e2v"], layer_norm(he), self._dtype)
            he_m = he_m * emask[..., None]
            inc = incidence_matrix(n)
            agg = jnp.einsum("en,beh->bnh", inc.astype(self._dtype),
                             he_m.astype(self._dtype),
                             preferred_element_type=jnp.float32)
            if self.degree_norm == "live_edges":
                deg = jnp.maximum(
                    jnp.einsum("en,be->bn", inc, emask), 1.0)  # [B, N]
            else:
                deg = jnp.maximum(vmask.sum(-1, keepdims=True) - 1.0, 1.0)
            hv = hv + jax.nn.gelu(agg / deg[..., None])
            hv = hv + dense(bp["v_mlp"], jax.nn.gelu(layer_norm(hv)),
                            self._dtype)
            he = he + dense(bp["e_mlp"], jax.nn.gelu(layer_norm(he)),
                            self._dtype)
        return dense(params["out"], he, self._dtype)
