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


def test_lm_sample_metrics_against_kernel(rng):
    task = _tiny_lm()
    params = task.init_params(rng)
    m = task.sample_metrics(params, rng, num_samples=32)
    assert set(m) == {"unigram_tv", "bigram_kl_bits", "metric_num_samples"}
    assert m["metric_num_samples"] == 32.0
    assert 0.0 <= m["unigram_tv"] <= 1.0
    # an untrained model should be far from the kernel; a KL of ~0 here
    # would mean the metric is broken
    assert np.isfinite(m["bigram_kl_bits"]) and m["bigram_kl_bits"] > 0.01


def test_lm_sample_metrics_oracle_sampler():
    """Samples drawn from the TRUE kernel must score near-zero TV/KL:
    pins the estimator itself (smoothing bias only)."""
    task = _tiny_lm()
    c = task.corpus
    rng = np.random.default_rng(0)
    K = c.vocab_size
    n, T = 64, task.seq_len
    # roll chains from the true kernel
    cdf = np.cumsum(c.transition_matrix, axis=1)
    x = np.zeros((n, T), np.int64)
    x[:, 0] = rng.choice(K, size=n, p=c.stationary)
    for t in range(1, T):
        u = rng.random(n)
        x[:, t] = np.array([np.searchsorted(cdf[s], uu)
                            for s, uu in zip(x[:, t - 1], u)])
    counts = np.zeros((K, K))
    np.add.at(counts, (x[:, :-1].ravel(), x[:, 1:].ravel()), 1.0)
    occ = counts.sum(1)
    p_occ = occ / occ.sum()
    phat = (counts + 1e-3) / (occ[:, None] + 1e-3 * K)
    kl = float((p_occ * (phat * np.log2(
        phat / np.maximum(c.transition_matrix, 1e-30))).sum(1)).sum())
    # 64*31 transitions over 27^2 cells: small but clearly below the
    # untrained-model scale (~1 bit)
    assert kl < 0.5


# -- causal transformer backbone -------------------------------------------


def test_causal_transformer_step_matches_apply(rng):
    """KV-cached sequential rollout must reproduce the batched causal
    pass exactly (causality + cache correctness)."""
    from categoricalnf_tpu.networks import CausalTransformer
    net = CausalTransformer(hidden_dim=32, num_heads=4, num_layers=2,
                            max_len=16, extra_dim=0,
                            compute_dtype="float32")
    B, T, D, O = 3, 10, 4, 6
    params = net.init(rng, D, O)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, D))
    full = net.apply(params, x, shift=True)

    carry = net.init_carry(B)
    x_prev = np.zeros((B, D), np.float32)
    outs = []
    for t in range(T):
        carry, o = net.step(params, carry, x_prev)
        outs.append(np.asarray(o))
        x_prev = np.asarray(x[:, t])
    seq = np.stack(outs, axis=1)
    np.testing.assert_allclose(seq, np.asarray(full), rtol=2e-4, atol=2e-4)


def test_causal_transformer_is_causal(rng):
    """Output at position t must be invariant to inputs at positions >= t
    (shift=True: strictly previous steps only)."""
    from categoricalnf_tpu.networks import CausalTransformer
    net = CausalTransformer(hidden_dim=32, num_heads=2, num_layers=2,
                            max_len=16, compute_dtype="float32")
    B, T, D, O = 2, 8, 3, 5
    params = net.init(rng, D, O)
    # the output head is zero-initialised (identity flow at init) — give
    # it random weights so causality violations are visible
    from categoricalnf_tpu.networks.common import dense_init
    params["out"] = dense_init(jax.random.fold_in(rng, 9), 32, O)
    x = jax.random.normal(jax.random.fold_in(rng, 2), (B, T, D))
    y1 = np.asarray(net.apply(params, x, shift=True))
    t0 = 5
    x2 = x.at[:, t0:].set(jax.random.normal(jax.random.fold_in(rng, 3),
                                            (B, T - t0, D)))
    y2 = np.asarray(net.apply(params, x2, shift=True))
    np.testing.assert_allclose(y1[:, :t0 + 1], y2[:, :t0 + 1],
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(y1[:, t0 + 1:], y2[:, t0 + 1:])


def test_lm_transformer_flow_roundtrip(rng):
    """Forward then inverse of the transformer-backed AR flow is identity
    and the ldjs cancel."""
    task = _tiny_lm(net="transformer")
    params = task.init_params(rng)
    flow = task.model.flow
    B, T, D = 4, task.seq_len, task.encoding_dim
    z = jax.random.normal(jax.random.fold_in(rng, 4), (B, T, D))
    zero = np.zeros((B,), np.float32)
    y, ldj_f = flow.forward(params["flow"], z, zero)
    z2, ldj_b = flow.inverse(params["flow"], y, zero)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ldj_f), -np.asarray(ldj_b),
                               rtol=1e-3, atol=1e-3)


def test_lm_transformer_task_trains(rng):
    task = _tiny_lm(net="transformer")
    params = task.init_params(rng)
    batch = next(task.train_batches(np.random.default_rng(0)))
    loss = float(task.loss(params, {"x": np.asarray(batch["x"])}, rng, 1.0))
    assert np.isfinite(loss) and loss > 0
    texts = task.sample_text(params, rng, num=2)
    assert len(texts) == 2 and all(len(t) == task.seq_len for t in texts)
