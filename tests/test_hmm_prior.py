"""HMMPrior: exactness of the forward recursion, FlowModel plumbing for
parametric priors, and the LM-task integration."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu import flows
from categoricalnf_tpu.ops import numerics as nm
from categoricalnf_tpu.tasks.language import LanguageModelingTask


def test_log_prob_matches_path_enumeration():
    S, T, D, B = 3, 4, 2, 2
    prior = flows.HMMPrior(num_states=S)
    rng = jax.random.PRNGKey(0)
    p = prior.init(rng, D)
    # non-trivial parameters
    p = {
        "start_logits": jnp.asarray([0.3, -0.5, 1.1]),
        "trans_logits": jax.random.normal(jax.random.PRNGKey(1), (S, S)),
        "means": jax.random.normal(jax.random.PRNGKey(2), (S, D)) * 2.0,
        "log_scales": jax.random.normal(jax.random.PRNGKey(3), (S, D)) * 0.3,
    }
    z = jax.random.normal(jax.random.PRNGKey(4), (B, T, D)) * 1.5

    got = prior.log_prob(p, z)

    log_pi = jax.nn.log_softmax(p["start_logits"])
    log_T = jax.nn.log_softmax(p["trans_logits"], axis=-1)
    emit = nm.logistic_log_pdf(z[..., None, :], p["means"],
                               p["log_scales"]).sum(-1)  # [B, T, S]
    want = []
    for b in range(B):
        path_lps = []
        for path in itertools.product(range(S), repeat=T):
            lp = log_pi[path[0]] + emit[b, 0, path[0]]
            for t in range(1, T):
                lp = lp + log_T[path[t - 1], path[t]] + emit[b, t, path[t]]
            path_lps.append(float(lp))
        want.append(jax.scipy.special.logsumexp(jnp.asarray(path_lps)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_masked_log_prob_equals_concatenated_sequence():
    """General masking (VERDICT r2 #8): masked positions are skipped with
    an identity transition, so the masked density must equal the density
    of the valid positions concatenated into a shorter sequence — for
    trailing padding, interior holes, AND leading masks alike."""
    S, D = 4, 2
    prior = flows.HMMPrior(num_states=S)
    p = {
        "start_logits": jax.random.normal(jax.random.PRNGKey(1), (S,)),
        "trans_logits": jax.random.normal(jax.random.PRNGKey(2), (S, S)),
        "means": jax.random.normal(jax.random.PRNGKey(3), (S, D)) * 2.0,
        "log_scales": jax.random.normal(jax.random.PRNGKey(4), (S, D)) * 0.3,
    }
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 6, D)) * 1.5
    for keep in ([0, 1, 2, 3], [0, 1, 4], [2, 3, 5], [1], []):
        mask = np.zeros((1, 6), np.float32)
        mask[0, keep] = 1.0
        got = float(prior.log_prob(p, z, mask=jnp.asarray(mask))[0])
        if keep:
            want = float(prior.log_prob(p, z[:, keep])[0])
        else:
            want = 0.0
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5), keep


def test_flow_model_parametric_prior_plumbing():
    D = 4
    model = flows.FlowModel(
        layers=(flows.ActNorm(), flows.InvertibleLinear()),
        prior=flows.HMMPrior(num_states=5))
    params = model.init(jax.random.PRNGKey(0), D)
    assert len(params) == 3  # 2 layers + prior params
    assert "trans_logits" in params[-1]

    z0 = jax.random.normal(jax.random.PRNGKey(1), (3, 6, D))
    lp = model.log_prob(params, z0)
    assert lp.shape == (3,) and np.all(np.isfinite(np.asarray(lp)))

    # forward/inverse roundtrip must ignore the trailing prior params
    zk, ldj = model.forward(params, z0)
    rec, ldj_inv = model.inverse(params, zk)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(z0), atol=1e-4)

    s = model.sample(params, jax.random.PRNGKey(2), (3, 6, D),
                     temperature=0.8)
    assert s.shape == (3, 6, D) and np.all(np.isfinite(np.asarray(s)))

    # data_init keeps the prior params entry
    p2 = model.data_init(params, z0)
    assert len(p2) == 3
    np.testing.assert_array_equal(np.asarray(p2[-1]["means"]),
                                  np.asarray(params[-1]["means"]))


def test_hmm_prior_can_represent_markov_latents():
    """On 2-state Markov latents the HMM prior alone (no flow layers)
    should beat the factorized logistic by a clear margin after a few
    gradient steps — the structural claim behind the lever."""
    import optax

    rngn = np.random.default_rng(0)
    T_mat = np.asarray([[0.9, 0.1], [0.2, 0.8]])
    means = np.asarray([[-2.0], [2.0]])
    B, T = 64, 32
    states = np.zeros((B, T), np.int64)
    states[:, 0] = rngn.integers(0, 2, B)
    for t in range(1, T):
        u = rngn.random(B)
        states[:, t] = np.where(u < T_mat[states[:, t - 1], 0], 0, 1)
    z = jnp.asarray(means[states]
                    + rngn.logistic(scale=0.3, size=(B, T, 1)))

    def nll(model, params):
        return -jnp.mean(model.log_prob(params, z))

    hmm = flows.FlowModel(layers=(), prior=flows.HMMPrior(num_states=4))
    base = flows.FlowModel(layers=(), prior=flows.LogisticPrior())
    p = hmm.init(jax.random.PRNGKey(0), 1)
    opt = optax.adam(0.1)
    st = opt.init(p)
    loss_fn = jax.jit(jax.value_and_grad(lambda q: nll(hmm, q)))
    for _ in range(200):
        loss, g = loss_fn(p)
        up, st = opt.update(g, st)
        p = optax.apply_updates(p, up)
    base_nll = float(nll(base, base.init(jax.random.PRNGKey(0), 1)))
    assert float(loss) < base_nll - 0.1 * T, (float(loss), base_nll)


def test_lm_task_hmm_prior_smoke():
    task = LanguageModelingTask(
        corpus_name="synthetic", seq_len=16, batch_size=8,
        encoding_dim=2, num_layers=1, hidden_dim=16, lstm_layers=1,
        num_mixtures=2, prior="hmm", prior_states=6,
        compute_dtype="float32")
    params = task.model.init(jax.random.PRNGKey(0))
    batch = next(task.train_batches(np.random.default_rng(0)))
    loss = task.loss(params, batch, jax.random.PRNGKey(1), beta=1.0)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: task.loss(p, batch, jax.random.PRNGKey(1),
                                     beta=1.0))(params)
    gnorm = float(optax_global_norm(g))
    assert np.isfinite(gnorm) and gnorm > 0
    # prior params receive gradient
    tg = g["flow"][-1]["trans_logits"]
    assert float(jnp.abs(tg).max()) > 0
    # sampling end-to-end
    x = task.model.sample(params, jax.random.PRNGKey(2), batch=4,
                          num_pos=16)
    assert x.shape == (4, 16)


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
