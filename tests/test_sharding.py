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


def test_trainer_runs_on_2d_mesh(tmp_path, rng):
    from categoricalnf_tpu.training import TrainConfig, Trainer
    task = _task()
    mesh = parallel.create_mesh(num_data=4, num_sample=2)
    cfg = TrainConfig(num_steps=3, eval_every=3, eval_samples=1,
                      log_every=10, out_dir=None)
    tr = Trainer(task, cfg, mesh=mesh)
    final = tr.train(resume=False)
    assert np.isfinite(final["best_bpd"])
