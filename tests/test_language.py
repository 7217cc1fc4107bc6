"""LM task tests: corpus handling, causal flow training, sampling."""

import jax
import numpy as np

from categoricalnf_tpu.tasks.language import (LanguageModelingTask,
                                              synthetic_markov_corpus)


def _tiny_lm(**kw):
    defaults = dict(corpus_name="synthetic", seq_len=32, batch_size=32,
                    encoding_dim=2, num_layers=1, hidden_dim=32,
                    lstm_layers=1, num_mixtures=4, eval_batches_count=1,
                    compute_dtype="float32")
    defaults.update(kw)
    return LanguageModelingTask(**defaults)


def test_synthetic_corpus_entropy():
    c = synthetic_markov_corpus(vocab_size=5, length=200_000, seed=3)
    assert c.analytic_bpc is not None
    # empirical conditional entropy should be close to analytic rate
    stream = c.splits["train"]
    counts = np.zeros((5, 5))
    np.add.at(counts, (stream[:-1], stream[1:]), 1)
    P = counts / np.maximum(counts.sum(1, keepdims=True), 1)
    pi = counts.sum(1) / counts.sum()
    emp = -(pi[:, None] * P * np.log2(np.maximum(P, 1e-12))).sum()
    assert abs(emp - c.analytic_bpc) < 0.05


def test_lm_task_loss_and_eval(rng):
    task = _tiny_lm()
    params = task.init_params(rng)
    batch = next(task.train_batches(np.random.default_rng(0)))
    batch = {"x": np.asarray(batch["x"])}
    loss = float(task.loss(params, batch, rng, 1.0))
    assert np.isfinite(loss) and loss > 0
    bpd = task.eval_step(params, batch, rng, 2)
    assert np.all(np.isfinite(np.asarray(bpd)))


def test_lm_short_training_progress(rng):
    """A few steps of training must reduce the loss measurably."""
    import optax
    task = _tiny_lm(batch_size=64)
    params = task.init_params(rng)
    batch0 = next(task.train_batches(np.random.default_rng(0)))
    params = task.data_init(params, {"x": np.asarray(batch0["x"])}, rng)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, x, key):
        loss, g = jax.value_and_grad(
            lambda pp: task.loss(pp, {"x": x}, key, 1.0))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    it = task.train_batches(np.random.default_rng(1))
    losses = []
    for i in range(40):
        b = next(it)
        params, opt, loss = step(params, opt, np.asarray(b["x"]),
                                 jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.3, losses[:3] + losses[-3:]


def test_lm_sampling_produces_text(rng):
    task = _tiny_lm()
    params = task.init_params(rng)
    texts = task.sample_text(params, rng, num=2)
    assert len(texts) == 2
    assert all(len(t) == task.seq_len for t in texts)
