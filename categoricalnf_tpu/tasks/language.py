"""Character-level language modeling tasks: PTB, text8 (paper §4.2).

Reference parity: ``experiments/language_modeling/`` (SURVEY.md C24) —
corpus chunking, char vocab, LM task with importance-sampled bits/char.

Data: the reference downloads PTB/text8; this environment has zero egress,
so the loaders read the standard files from ``data_dir`` when present
(``ptb.char.{train,valid,test}.txt`` or the 100MB ``text8`` blob) and fall
back to a synthetic first-order Markov character source whose exact
entropy rate is computable — giving an analytic bits/char optimum to
validate training against (same role the set-shuffling optimum plays,
SURVEY.md §4.3).

Model: time-autoregressive mixture-CDF flow — all channels at step t
transform conditioned on steps < t via a causal LSTM (paper's
"autoregressive coupling prior").  Training/likelihood is one parallel
causal pass; sampling rolls the LSTM sequentially (SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from categoricalnf_tpu import encodings, flows, networks
from categoricalnf_tpu.data import native_loader
from categoricalnf_tpu.models.categorical_flow import CategoricalFlow
from categoricalnf_tpu.training.task import TaskTemplate

PTB_FILES = {"train": "ptb.char.train.txt", "valid": "ptb.char.valid.txt",
             "test": "ptb.char.test.txt"}


# ---------------------------------------------------------------------------
# Corpora
# ---------------------------------------------------------------------------


class CharCorpus:
    """Token streams + vocab for train/valid/test splits."""

    def __init__(self, splits: dict[str, np.ndarray], vocab: list[str],
                 name: str, analytic_bpc: Optional[float] = None,
                 transition_matrix: Optional[np.ndarray] = None,
                 stationary: Optional[np.ndarray] = None):
        self.splits = splits
        self.vocab = vocab
        self.name = name
        self.analytic_bpc = analytic_bpc
        # Known generating kernel (synthetic corpora only): enables
        # sample-quality metrics against ground truth.
        self.transition_matrix = transition_matrix
        self.stationary = stationary

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)


def load_ptb_char(data_dir: str) -> CharCorpus:
    """Mikolov character-level PTB: files are WHITESPACE-SEPARATED
    character tokens per line ('_' encodes the original spaces), so each
    token — not each raw character — is one modeled symbol; anything else
    doubles the sequence with separator spaces and makes bits/char
    incomparable to published numbers (ADVICE r1 medium)."""
    tokens = {}
    for split, fname in PTB_FILES.items():
        with open(os.path.join(data_dir, fname)) as f:
            tokens[split] = f.read().split()
    chars = sorted(set(tokens["train"]))
    idx = {c: i for i, c in enumerate(chars)}
    for split in ("valid", "test"):
        oov = set(tokens[split]) - set(chars)
        if oov:
            raise ValueError(
                f"PTB {split} split has symbols absent from the train "
                f"vocab: {sorted(oov)!r} — refusing to silently drop them")
    splits = {k: np.asarray([idx[c] for c in v], np.int32)
              for k, v in tokens.items()}
    return CharCorpus(splits, chars, "ptb_char")


def load_text8(data_dir: str) -> CharCorpus:
    """text8: 100M chars of a-z+space; 90/5/5M split (standard)."""
    with open(os.path.join(data_dir, "text8")) as f:
        text = f.read()
    chars = sorted(set(text))  # 27 symbols
    idx = {c: i for i, c in enumerate(chars)}
    arr = np.asarray([idx[c] for c in text], np.int32)
    n = len(arr)
    a, b = int(n * 0.9), int(n * 0.95)
    return CharCorpus({"train": arr[:a], "valid": arr[a:b],
                       "test": arr[b:]}, chars, "text8")


def synthetic_markov_corpus(vocab_size: int = 27, length: int = 20_000_000,
                            seed: int = 0,
                            concentration: float = 0.3) -> CharCorpus:
    """First-order Markov chain with Dirichlet rows; exact entropy rate.

    The analytic bits/char (stationary entropy rate) is the optimum any
    model can reach — used as the LM correctness beacon when the real
    corpora are absent.  Length default is 20M chars (~1.2 s via the C++
    rollout): at 2M the 3-block/512 flow memorized the train split
    (runs/lm_v4: train loss sank below the entropy rate while val bpd
    climbed 3.60→4.30 between 15k and 35k steps) — synthetic data is
    free, so the corpus is sized to make overfitting impossible at these
    model sizes, like the real 100M-char text8.
    """
    rng = np.random.default_rng(seed)
    P = rng.dirichlet([concentration] * vocab_size, size=vocab_size)
    # stationary distribution: left eigenvector of P
    evals, evecs = np.linalg.eig(P.T)
    i = int(np.argmin(np.abs(evals - 1.0)))
    pi = np.real(evecs[:, i])
    pi = np.abs(pi) / np.abs(pi).sum()
    ent = -(pi[:, None] * P * np.log2(np.maximum(P, 1e-30))).sum()

    # sample one long chain, then split (C++ rollout when available)
    state = int(rng.choice(vocab_size, p=pi))
    out = native_loader.markov_rollout(seed + 17, P, length, state)
    if out is None:
        out = np.empty(length, np.int32)
        cdf = np.cumsum(P, axis=1)
        u = rng.random(length)
        for t in range(length):
            state = int(np.searchsorted(cdf[state], u[t]))
            out[t] = state
    n = length
    a, b = int(n * 0.9), int(n * 0.95)
    vocab = [chr(ord("a") + i) if i < 26 else "_" for i in range(vocab_size)]
    return CharCorpus({"train": out[:a], "valid": out[a:b], "test": out[b:]},
                      vocab, "synthetic_markov", analytic_bpc=float(ent),
                      transition_matrix=P, stationary=pi)


def load_corpus(name: str, data_dir: Optional[str] = None) -> CharCorpus:
    data_dir = data_dir or os.environ.get("CNF_DATA_DIR", "data")
    if name == "ptb":
        path = os.path.join(data_dir, PTB_FILES["train"])
        if os.path.exists(path):
            return load_ptb_char(data_dir)
        return synthetic_markov_corpus(vocab_size=50, seed=1)
    if name == "text8":
        if os.path.exists(os.path.join(data_dir, "text8")):
            return load_text8(data_dir)
        return synthetic_markov_corpus(vocab_size=27, seed=2)
    if name == "synthetic":
        return synthetic_markov_corpus()
    raise ValueError(f"unknown corpus {name!r}")


# ---------------------------------------------------------------------------
# Flow assembly + task
# ---------------------------------------------------------------------------


def build_lm_flow(dim: int, num_layers: int = 2, hidden_dim: int = 512,
                  lstm_layers: int = 2, num_mixtures: int = 16,
                  compute_dtype: str = "bfloat16",
                  scan_blocks: bool = True,
                  channel_coupling: bool = True,
                  net: str = "lstm", seq_len: int = 512,
                  input_feats: int = 0, prior: str = "logistic",
                  prior_states: int = 32) -> flows.FlowModel:
    """LM flow: autoregressive in time AND (by default) coupling in
    channels — the reference's design (SURVEY.md C5+C15).  Each block has
    both parities so every channel transforms with within-step context;
    `channel_coupling=False` falls back to transform-all-channels layers
    (channels conditionally independent per step).

    ``net`` picks the causal backbone: ``lstm`` (reference parity) or
    ``transformer`` (TPU-native: the training pass is pure batched
    attention matmuls with no sequential scan; sampling uses a KV cache).

    ``prior='hmm'`` swaps the factorized top for a learned latent
    state-space prior (flows.HMMPrior) — the structure the exact gap
    decomposition shows the flow otherwise has to spend its capacity
    approximating (benchmarks/lm_diagnostics.py: 0.244 of the 0.257-bit
    1-sample gap on runs/lm_v4 is flow-density deficit vs the HMM-optimal
    latent density, only 0.013 decoder confusion)."""

    def make_net(parity):
        extra = dim if parity is not None else 0
        if net == "lstm":
            return networks.CausalLSTM(
                hidden_dim=hidden_dim, num_layers=lstm_layers,
                extra_dim=extra, compute_dtype=compute_dtype)
        if net == "transformer":
            return networks.CausalTransformer(
                hidden_dim=hidden_dim, num_layers=lstm_layers,
                max_len=seq_len, extra_dim=extra,
                compute_dtype=compute_dtype)
        raise ValueError(f"unknown LM net {net!r}")

    def ar(parity):
        return flows.AutoregressiveMixtureCDF(
            net=make_net(parity), num_mixtures=num_mixtures, parity=parity,
            input_feats=input_feats)

    if channel_coupling:
        block = (flows.ActNorm(), flows.InvertibleLinear(), ar(0),
                 flows.SoftClamp(),
                 flows.ActNorm(), flows.InvertibleLinear(), ar(1),
                 flows.SoftClamp())
    else:
        block = (flows.ActNorm(), flows.InvertibleLinear(), ar(None),
                 flows.SoftClamp())
    top = flows.create_prior(prior, **({"num_states": prior_states}
                                       if prior == "hmm" else {}))
    if scan_blocks and num_layers > 1:
        return flows.FlowModel(
            layers=(flows.ScannedBlocks(block=block, depth=num_layers),),
            prior=top)
    layers = []
    for _ in range(num_layers):
        layers.extend(block)
    return flows.FlowModel(layers=tuple(layers), prior=top)


@dataclasses.dataclass
class LanguageModelingTask(TaskTemplate):
    corpus_name: str = "ptb"
    data_dir: Optional[str] = None
    seq_len: int = 256
    batch_size: int = 128
    encoding_dim: int = 3
    encoding_name: str = "mixture"
    num_layers: int = 2
    hidden_dim: int = 512
    lstm_layers: int = 2
    num_mixtures: int = 16
    net: str = "lstm"
    # V-component soft-classifier features of z_{t-1} fed to the causal
    # nets (0 = off; the natural setting is the vocab size).
    input_feats: int = 0
    # Top-of-flow prior: "logistic" (factorized, reference parity) or
    # "hmm" (learned latent state-space prior, see build_lm_flow).
    prior: str = "logistic"
    prior_states: int = 32
    eval_batches_count: int = 8
    compute_dtype: str = "bfloat16"
    name: str = "language_modeling"

    def __post_init__(self):
        self.corpus = load_corpus(self.corpus_name, self.data_dir)
        self.name = f"lm_{self.corpus.name}"
        enc = encodings.create_encoding(
            self.encoding_name, num_categories=self.corpus.vocab_size,
            dim=self.encoding_dim)
        self.model = CategoricalFlow(
            encoding=enc,
            flow=build_lm_flow(enc.dim, self.num_layers, self.hidden_dim,
                               self.lstm_layers, self.num_mixtures,
                               self.compute_dtype, net=self.net,
                               seq_len=self.seq_len,
                               input_feats=self.input_feats,
                               prior=self.prior,
                               prior_states=self.prior_states))

    def _chunks(self, split: str, rng: np.random.Generator,
                n: int) -> np.ndarray:
        stream = self.corpus.splits[split]
        out = native_loader.chunk_corpus(int(rng.integers(2**62)), stream,
                                         n, self.seq_len)
        if out is not None:
            return out
        starts = rng.integers(0, len(stream) - self.seq_len - 1, n)
        return np.stack([stream[s:s + self.seq_len] for s in starts])

    def train_batches(self, rng: np.random.Generator) -> Iterator[dict]:
        while True:
            yield {"x": self._chunks("train", rng, self.batch_size)}

    def eval_batches(self) -> list[dict]:
        rng = np.random.default_rng(99)
        return [{"x": self._chunks("valid", rng, self.batch_size)}
                for _ in range(self.eval_batches_count)]

    def test_batches(self) -> list[dict]:
        rng = np.random.default_rng(101)
        return [{"x": self._chunks("test", rng, self.batch_size)}
                for _ in range(self.eval_batches_count)]

    def analytic_optimum_bpd(self) -> Optional[float]:
        return self.corpus.analytic_bpc

    def sample_text(self, params, rng: jax.Array, num: int = 4) -> list[str]:
        x = self.model.sample(params, rng, batch=num, num_pos=self.seq_len)
        x = np.asarray(x)
        return ["".join(self.corpus.vocab[i] for i in row) for row in x]

    def sample_metrics(self, params, rng: jax.Array,
                       num_samples: int = 256,
                       temperature: float = 1.0) -> dict:
        """Sample-quality against the known generating kernel (synthetic
        corpora only — the LM analogue of molecule validity; reference
        LM evals are likelihood-only, SURVEY.md C24, so this is extra
        evidence, not a parity metric).

        - ``unigram_tv``: total variation between the sampled character
          marginal and the true stationary distribution.
        - ``bigram_kl_bits``: occupancy-weighted KL (bits/transition)
          between the sampled transition estimate and the true kernel;
          upward-biased by estimation noise at fixed sample size, so it
          is comparable across runs at equal ``num_samples``.
        """
        P = self.corpus.transition_matrix
        if P is None:
            return {}
        # temperature as a TRACED scalar: one compile serves all sweep
        # temperatures (sample_eval CLI).
        sample_fn = jax.jit(
            lambda p, k, t: self.model.sample(
                p, k, batch=self.batch_size, num_pos=self.seq_len,
                temperature=t))
        K = self.corpus.vocab_size
        counts = np.zeros((K, K), np.float64)
        done = 0
        i = 0
        while done < num_samples:
            b = min(self.batch_size, num_samples - done)
            x = np.asarray(sample_fn(params, jax.random.fold_in(rng, i),
                                     jnp.float32(temperature)))[:b]
            np.add.at(counts, (x[:, :-1].ravel(), x[:, 1:].ravel()), 1.0)
            done += b
            i += 1
        occ = counts.sum(1)
        p_occ = occ / occ.sum()
        phat = (counts + 1e-3) / (occ[:, None] + 1e-3 * K)
        kl_rows = (phat * np.log2(phat / np.maximum(P, 1e-30))).sum(1)
        marg = counts.sum(0) + counts.sum(1)
        marg = marg / marg.sum()
        tv = 0.5 * np.abs(marg - self.corpus.stationary).sum()
        return {"unigram_tv": float(tv),
                "bigram_kl_bits": float((p_occ * kl_rows).sum()),
                "metric_num_samples": float(done)}

    def sample_artifacts(self, params, rng: jax.Array, out_dir: str) -> None:
        texts = self.sample_text(params, rng, num=8)
        with open(os.path.join(out_dir, "samples.txt"), "w") as f:
            for t in texts:
                f.write(t + "\n---\n")
