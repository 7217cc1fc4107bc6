"""Graph coloring task + RGCN tests."""

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu.networks.graph import RGCN
from categoricalnf_tpu.tasks.graph_coloring import (GraphColoringTask,
                                                    coloring_validity,
                                                    random_colorable_graph,
                                                    repair_coloring)


def _tiny_task(**kw):
    d = dict(min_nodes=6, max_nodes=10, batch_size=32, encoding_dim=2,
             num_layers=2, hidden_dim=32, num_mixtures=4,
             eval_batches_count=1)
    d.update(kw)
    return GraphColoringTask(**d)


def test_generator_produces_valid_colorings():
    rng = np.random.default_rng(0)
    for _ in range(10):
        adj, colors = random_colorable_graph(rng, 12)
        v = coloring_validity(adj[None], colors[None],
                              np.ones((1, 12), np.float32))
        assert bool(v[0])


def test_rgcn_respects_adjacency(rng):
    """Node output must depend on neighbours but not on non-neighbours."""
    net = RGCN(hidden_dim=16, num_layers=1)
    B, N, D = 1, 6, 4
    params = net.init(rng, D, 8)
    # the coupling-net output layer is zero-init by design; randomise it so
    # dependence is observable
    params["out"]["w"] = jax.random.normal(rng, params["out"]["w"].shape) * 0.1
    x = jax.random.normal(rng, (B, N, D))
    adj = np.zeros((B, N, N), np.float32)
    adj[0, 0, 1] = adj[0, 1, 0] = 1.0  # only edge 0-1
    out1 = net.apply(params, x, cond={"adj": jnp.asarray(adj)})
    x2 = x.at[0, 5].set(x[0, 5] + 10.0)  # perturb isolated node 5
    out2 = net.apply(params, x2, cond={"adj": jnp.asarray(adj)})
    np.testing.assert_allclose(np.asarray(out1[0, :5]),
                               np.asarray(out2[0, :5]), atol=1e-5)
    x3 = x.at[0, 1].set(x[0, 1] + 10.0)  # perturb neighbour of node 0
    out3 = net.apply(params, x3, cond={"adj": jnp.asarray(adj)})
    assert not np.allclose(np.asarray(out1[0, 0]), np.asarray(out3[0, 0]))


def test_coloring_task_loss_eval_sample(rng):
    task = _tiny_task()
    params = task.init_params(rng)
    batch = next(task.train_batches(np.random.default_rng(0)))
    batch = {k: jax.tree.map(jnp.asarray, v) for k, v in batch.items()}
    loss = float(task.loss(params, batch, rng, 1.0))
    assert np.isfinite(loss) and loss > 0
    bpd = task.eval_step(params, batch, rng, 2)
    assert np.all(np.isfinite(np.asarray(bpd)))
    m = task.sample_metrics(params, rng, num_samples=16)
    assert 0.0 <= m["coloring_validity"] <= 1.0
    assert m["metric_num_samples"] == 16.0
    # corrected column exists and can only improve on raw
    assert m["coloring_validity_corrected"] >= m["coloring_validity"]
    mk = task.sample_metrics(params, rng, num_samples=16, best_of_k=3)
    assert mk["coloring_validity_at_k"] >= mk["coloring_validity"]
    assert mk["best_of_k"] == 3.0


def test_repair_coloring_greedy():
    rng = np.random.default_rng(0)
    B, N, K = 32, 12, 3
    adj = np.zeros((B, N, N), np.float32)
    colors = np.zeros((B, N), np.int64)
    mask = np.zeros((B, N), np.float32)
    for b in range(B):
        k = int(rng.integers(6, N + 1))
        a, _ = random_colorable_graph(rng, k)
        adj[b, :k, :k] = a
        mask[b, :k] = 1
        colors[b, :k] = rng.integers(0, K, k)
    probs = rng.random((B, N, K))
    raw = coloring_validity(adj, colors, mask)
    fixed = repair_coloring(adj, probs, colors, mask)
    corr = coloring_validity(adj, fixed, mask)
    assert corr.mean() >= raw.mean()
    assert all(corr[raw]), "repair broke an already-valid coloring"
    assert (fixed[mask == 0] == colors[mask == 0]).all(), "touched padding"


def test_coloring_training_progress(rng):
    import optax
    task = _tiny_task()
    params = task.init_params(rng)
    b0 = next(task.train_batches(np.random.default_rng(0)))
    b0 = {k: jax.tree.map(jnp.asarray, v) for k, v in b0.items()}
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
    for i in range(40):
        b = {k: jax.tree.map(jnp.asarray, v) for k, v in next(it).items()}
        params, opt, loss = step(params, opt, b, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.2, (
        losses[:3], losses[-3:])
