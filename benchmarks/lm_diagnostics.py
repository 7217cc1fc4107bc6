"""Exact gap decomposition for a trained LM run on the synthetic corpus.

The synthetic Markov corpus has a KNOWN generating kernel, which makes the
model's bits/char gap decomposable EXACTLY (not diagnostically-suggestively
like the molecule report).  With the trained encoder q(z|x) fixed, the
latent marginal under the true source is a hidden Markov model

    p*(z) = sum_x p_true(x) prod_t q(z_t | x_t)

whose log-density is one forward-algorithm scan over the V states, and the
optimal sequence decoder is its Bayes posterior p*(x|z) = p_true(x)
q(z|x) / p*(z).  Substituting into the 1-sample ELBO,

    bpd - h  =  flow_deficit + decoder_deficit        (identity, per batch)
    flow_deficit    = E[ log p*(z) - log p_model(z) ] / (T ln2)   >= 0 in
                      expectation (it is KL(p* || p_model) under z ~ p*)
    decoder_deficit = E[ log p*(x|z) - log p_dec(x|z) ] / (T ln2)
                    = (E[log p_true(x)] + E[log q] - E[log p*(z)]
                       - E[log p_dec]) / (T ln2)

so the report says precisely whether remaining bits live in the FLOW
(p_model(z) misses the HMM structure -> more flow capacity/steps) or in
the DECODER (the per-position Bayes decoder cannot recover x from
overlapping encoder modes -> separate the modes: encoding dim / sigma /
init spread), a distinction sampled-text metrics cannot make.

Reference parity: no counterpart — the reference reports only the IS
bound (SURVEY.md §3.2); this uses the same known-kernel trick as the
set-task analytic optima (SURVEY.md §4.3).

Usage:
    CNF_PLATFORM=cpu python benchmarks/lm_diagnostics.py \
        --run runs/lm_v4 [--num_batches 4] [--is_samples 32]

Prints a JSON report and writes <run>/lm_diagnostics.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from categoricalnf_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from categoricalnf_tpu.inference import load_run  # noqa: E402

LN2 = 0.6931471805599453


def hmm_log_marginal(log_emit: jax.Array, log_pi: jax.Array,
                     log_T: jax.Array) -> jax.Array:
    """log p*(z) per sequence.  log_emit: [B, T, V] per-position
    per-category emission log-densities log q(z_t|c)."""

    def step(log_alpha, emit_t):  # log_alpha [B, V], emit_t [B, V]
        # logsumexp_c' ( log_alpha[c'] + log_T[c', c] ) + emit_t[c]
        nxt = jax.scipy.special.logsumexp(
            log_alpha[:, :, None] + log_T[None, :, :], axis=1) + emit_t
        return nxt, None

    first = log_pi[None, :] + log_emit[:, 0]
    last, _ = jax.lax.scan(step, first,
                           jnp.swapaxes(log_emit[:, 1:], 0, 1))
    return jax.scipy.special.logsumexp(last, axis=-1)  # [B]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--num_batches", type=int, default=4)
    ap.add_argument("--is_samples", type=int, default=32)
    ap.add_argument("--elbo_samples", type=int, default=4,
                    help="rng draws per batch for the 1-sample terms")
    ap.add_argument("--split", default="test", choices=["valid", "test"])
    args = ap.parse_args()

    handle = load_run(args.run, compute_dtype="float32")
    task = handle.task
    params = jax.tree.map(jnp.asarray, handle.params)
    corpus = task.corpus
    if corpus.transition_matrix is None:
        raise SystemExit("corpus has no known kernel; decomposition needs "
                         "the synthetic Markov source")
    model = task.eval_model
    enc = model.encoding
    h = float(corpus.analytic_bpc)

    T_mat = np.asarray(corpus.transition_matrix, np.float64)
    pi = np.asarray(corpus.stationary, np.float64)
    log_T = jnp.asarray(np.log(T_mat), jnp.float32)
    log_pi = jnp.asarray(np.log(pi), jnp.float32)

    @jax.jit
    def terms(x, key):
        parts = model.elbo(params, x, key)
        z, _ = enc.encode(params["encoding"], x, key)  # same key => same z
        ep = params["encoding"]
        from categoricalnf_tpu.ops import numerics as nm
        mu, ls = ep["means"], enc._ls(ep["log_scales"])
        log_emit = nm.logistic_log_pdf(z[..., None, :], mu, ls).sum(-1)
        log_star = hmm_log_marginal(log_emit, log_pi, log_T)
        # true source log-prob of the chunk (stationary start)
        lp_x = (log_pi[x[:, 0]]
                + jnp.take_along_axis(
                    log_T[x[:, :-1]], x[:, 1:, None], axis=-1)[..., 0]
                .sum(-1))
        dec_hat = enc.decode(ep, z)
        acc = jnp.mean((dec_hat == x).astype(jnp.float32))
        return {k: jnp.mean(v) for k, v in parts.items()} | {
            "log_star": jnp.mean(log_star), "log_px_true": jnp.mean(lp_x),
            "dec_acc": acc}

    batches = (task.test_batches() if args.split == "test"
               else task.eval_batches())[: args.num_batches]
    seq = float(task.seq_len)
    acc: dict[str, list[float]] = {}
    rng = jax.random.PRNGKey(7)
    for i, b in enumerate(batches):
        x = jnp.asarray(b["x"])
        for j in range(args.elbo_samples):
            key = jax.random.fold_in(rng, i * 1000 + j)
            out = terms(x, key)
            for k, v in out.items():
                acc.setdefault(k, []).append(float(v))
    m = {k: float(np.mean(v)) for k, v in acc.items()}

    to_bits = 1.0 / (seq * LN2)
    flow_deficit = (m["log_star"] - m["log_pz"]) * to_bits
    # E[log p*(x|z)] = E[log p_true(x)] + E[log q] - E[log p*(z)]
    log_dec_star = m["log_px_true"] + m["log_q"] - m["log_star"]
    decoder_deficit = (log_dec_star - m["log_dec"]) * to_bits
    bpd_1 = -m["elbo"] * to_bits

    # IS bound for reference (honest fp32 path)
    is_vals = []
    for i, b in enumerate(batches):
        key = jax.random.fold_in(rng, 777 + i)
        is_vals.append(float(np.mean(np.asarray(
            task.eval_step(params, b, key, args.is_samples)))))
    bpd_is = float(np.mean(is_vals))

    # chunked optimum: chunks start at stationary offsets, so the first
    # position costs H(pi), not the conditional entropy rate
    h_pi = float(-(pi * np.log(pi)).sum() / LN2)
    chunked_opt = (h_pi + (seq - 1.0) * h) / seq

    report = {
        "run": args.run, "step": handle.step, "split": args.split,
        "seq_len": int(seq), "entropy_rate_bpc": h,
        "chunked_optimum_bpc": chunked_opt,
        "bpd_1sample": bpd_1,
        f"bpd_is{args.is_samples}": bpd_is,
        "gap_1sample": bpd_1 - h,
        "flow_deficit_bits": flow_deficit,
        "decoder_deficit_bits": decoder_deficit,
        # exact identity: bpd_1 - empirical true bpc == flow + decoder
        "identity_residual": (bpd_1 - (-m["log_px_true"] * to_bits)
                              - flow_deficit - decoder_deficit),
        "true_source_bpc_on_batches": -m["log_px_true"] * to_bits,
        "decoder_roundtrip_acc": m["dec_acc"],
        "terms_bits": {
            "rate": (m["log_q"] - m["log_pz"]) * to_bits,
            "recon": -m["log_dec"] * to_bits,
            "log_star": -m["log_star"] * to_bits,
        },
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(args.run, "lm_diagnostics.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
