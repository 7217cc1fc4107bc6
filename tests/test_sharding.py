"""Mesh/sharding tests on the 8-device virtual CPU platform (SURVEY.md §4.4):
the sharded computation must agree with single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from categoricalnf_tpu import parallel
from categoricalnf_tpu.parallel.eval import make_sharded_iw_eval
from categoricalnf_tpu.tasks import SetShufflingTask


def _task():
    return SetShufflingTask(set_size=8, batch_size=64, encoding_dim=2,
                            num_layers=2, hidden_dim=32, num_mixtures=4,
                            eval_batches_count=1)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_creation():
    mesh = parallel.create_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh2 = parallel.create_mesh(num_data=4, num_sample=2)
    assert mesh2.devices.shape == (4, 2)


def test_sharded_loss_matches_single_device(rng):
    task = _task()
    params = task.init_params(rng)
    x = np.asarray(next(task.train_batches(np.random.default_rng(0)))["x"])

    loss_local = float(task.loss(params, {"x": jnp.asarray(x)}, rng, 1.0))

    mesh = parallel.create_mesh()
    batch = parallel.shard_batch(mesh, {"x": jnp.asarray(x)})
    loss_sharded = float(jax.jit(
        lambda p, b: task.loss(p, b, rng, 1.0))(params, batch))
    assert abs(loss_local - loss_sharded) < 1e-4


def test_sharded_grad_step_matches_single_device(rng):
    task = _task()
    params = task.init_params(rng)
    x = jnp.asarray(
        next(task.train_batches(np.random.default_rng(0)))["x"])
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)

    def step(p, s, batch):
        g = jax.grad(lambda pp: task.loss(pp, batch, rng, 1.0))(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u)

    p_local = jax.jit(step)(params, opt_state, {"x": x})

    mesh = parallel.create_mesh()
    sharded = parallel.shard_batch(mesh, {"x": x})
    p_repl = jax.device_put(params, parallel.replicated(mesh))
    p_shard = jax.jit(step)(p_repl, opt_state, sharded)

    flat1 = jax.tree.leaves(p_local)
    flat2 = jax.tree.leaves(p_shard)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sample_chain_sharded_iw_eval(rng):
    task = _task()
    params = task.init_params(rng)
    x = jnp.asarray(
        next(task.train_batches(np.random.default_rng(0)))["x"])

    mesh = parallel.create_mesh(num_data=4, num_sample=2)
    eval_fn = make_sharded_iw_eval(task.model, mesh)
    bpd_sharded = eval_fn(params, x, rng, num_samples=8)

    # reference: plain vmap on device 0
    bpd_local = task.model.eval_bpd(params, x, rng, num_samples=8)
    np.testing.assert_allclose(np.asarray(bpd_sharded),
                               np.asarray(bpd_local), rtol=2e-4, atol=2e-4)


def _grads_allclose(g1, g2, rtol=2e-4, atol=2e-5):
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


def test_molecule_sharded_step_matches_single_device(rng):
    """GraphCNF (masked variable-size graphs, three latent streams) is
    where SPMD partitioning has something to get wrong — certify
    sharded-vs-single equality on loss AND grads (VERDICT r2 missing #7)."""
    from categoricalnf_tpu.tasks.molecules import MoleculeTask
    task = MoleculeTask(dataset="synthetic", max_nodes=12, batch_size=16,
                        num_layers_node=2, num_layers_edge=2, hidden_dim=32,
                        num_mixtures=4, synth_size=64, node_cond_atoms=True,
                        bond_cond_degree=True, eval_batches_count=1)
    params = task.init_params(rng)
    batch_np = next(task.train_batches(np.random.default_rng(0)))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def loss_and_grad(p, b):
        return jax.value_and_grad(
            lambda pp: task.loss(pp, b, rng, 1.0))(p)

    loss_local, g_local = jax.jit(loss_and_grad)(params, batch)

    mesh = parallel.create_mesh()
    sharded = parallel.shard_batch(mesh, batch)
    p_repl = jax.device_put(params, parallel.replicated(mesh))
    loss_sh, g_sh = jax.jit(loss_and_grad)(p_repl, sharded)

    assert abs(float(loss_local) - float(loss_sh)) < 1e-4
    _grads_allclose(g_local, g_sh)


def test_lm_hmm_sharded_step_matches_single_device(rng):
    """LM flow with the HMM prior: a lax.scan (LSTM) inside the flow and
    a second scan (forward recursion) inside the prior, both under a
    sharded batch (VERDICT r2 missing #7)."""
    from categoricalnf_tpu.tasks import LanguageModelingTask
    task = LanguageModelingTask(
        corpus_name="synthetic", seq_len=16, batch_size=16,
        encoding_dim=2, num_layers=1, hidden_dim=16, lstm_layers=1,
        num_mixtures=2, prior="hmm", prior_states=4,
        compute_dtype="float32")
    params = task.init_params(rng)
    batch_np = next(task.train_batches(np.random.default_rng(0)))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def loss_and_grad(p, b):
        return jax.value_and_grad(
            lambda pp: task.loss(pp, b, rng, 1.0))(p)

    loss_local, g_local = jax.jit(loss_and_grad)(params, batch)

    mesh = parallel.create_mesh()
    sharded = parallel.shard_batch(mesh, batch)
    p_repl = jax.device_put(params, parallel.replicated(mesh))
    loss_sh, g_sh = jax.jit(loss_and_grad)(p_repl, sharded)

    assert abs(float(loss_local) - float(loss_sh)) < 1e-4
    _grads_allclose(g_local, g_sh)


def test_trainer_runs_on_2d_mesh(tmp_path, rng):
    from categoricalnf_tpu.training import TrainConfig, Trainer
    task = _task()
    mesh = parallel.create_mesh(num_data=4, num_sample=2)
    cfg = TrainConfig(num_steps=3, eval_every=3, eval_samples=1,
                      log_every=10, out_dir=None)
    tr = Trainer(task, cfg, mesh=mesh)
    final = tr.train(resume=False)
    assert np.isfinite(final["best_bpd"])


def test_trainer_multi_step_on_2d_mesh(rng):
    """steps_per_call > 1 under a 2-axis mesh: stacked [K, B, ...]
    batches shard over 'data', IS eval shards over 'sample'."""
    from categoricalnf_tpu.training import TrainConfig, Trainer
    task = _task()
    mesh = parallel.create_mesh(num_data=4, num_sample=2)
    cfg = TrainConfig(num_steps=6, eval_every=6, eval_samples=2,
                      log_every=4, out_dir=None, run_test=False,
                      steps_per_call=2)
    tr = Trainer(task, cfg, mesh=mesh)
    final = tr.train(resume=False)
    assert np.isfinite(final["best_bpd"])
    assert int(tr._final_state.step) == 6
