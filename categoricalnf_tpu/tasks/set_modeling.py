"""Set shuffling / set summation tasks (paper §4.1).

Reference parity: ``experiments/set_modeling/`` (SURVEY.md C23).

- **Set shuffling**: uniform distribution over permutations of S distinct
  tokens.  Analytic optimum log2(S!)/S bits/var — the framework's absolute
  correctness beacon.
- **Set summation**: length-S sequences over {1..K} constrained to sum to
  L; analytic optimum log2(#{valid sequences})/S via a counting DP.

Datasets are generated on the fly in numpy (the reference uses torch
datasets + DataLoader workers; synthetic data needs no IO pipeline).
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Iterator

import jax
import numpy as np

from categoricalnf_tpu import encodings, flows, networks
from categoricalnf_tpu.data import native_loader
from categoricalnf_tpu.models.categorical_flow import CategoricalFlow
from categoricalnf_tpu.training.task import TaskTemplate


def build_set_flow(dim: int, num_layers: int = 8, hidden_dim: int = 96,
                   num_heads: int = 4, num_mixtures: int = 8,
                   compute_dtype: str = "float32",
                   scan_blocks: bool | None = None,
                   remat: bool = False,
                   fused: bool = False,
                   unroll: int = 1) -> flows.FlowModel:
    """Coupling stack with permutation-equivariant transformer nets.

    With ``scan_blocks`` the repeated two-parity block runs under
    ``lax.scan`` (flows.ScannedBlocks) — ~N× less compile work, identical
    semantics.  ``scan_blocks=None`` resolves automatically: unrolled for
    stacks of ≤8 layers, scanned above.  Measured round 5 (idle v5e,
    forced sync, B=1024): the unrolled 8-layer flagship runs **64.8k
    samples/s vs 47.4k** for scan+remat (+37%) — removing the scan lets
    XLA fuse across layer boundaries, confirming the step is
    fusion-overhead-bound (PERFORMANCE.md round-5 sweep).  The scan stays
    the right call for deep/graph stacks where compile time and remat
    (activation memory) dominate; note remat is a ScannedBlocks property,
    so an unrolled stack stores activations.
    """
    if scan_blocks is None:
        scan_blocks = num_layers > 8
    net = networks.SetTransformer(hidden_dim=hidden_dim, num_heads=num_heads,
                                  num_layers=2, compute_dtype=compute_dtype,
                                  fused=fused)

    def sub(parity):
        return (flows.ActNorm(), flows.InvertibleLinear(),
                flows.MixtureCDFCoupling(net=net, mask_kind="channel",
                                         parity=parity,
                                         num_mixtures=num_mixtures),
                flows.SoftClamp())

    if scan_blocks and num_layers % 2 == 0 and num_layers >= 4:
        block = sub(0) + sub(1)
        return flows.FlowModel(
            layers=(flows.ScannedBlocks(block=block, depth=num_layers // 2,
                                        remat=remat, unroll=unroll),),
            prior=flows.LogisticPrior())
    layers = []
    for i in range(num_layers):
        layers.extend(sub(i % 2))
    return flows.FlowModel(layers=tuple(layers), prior=flows.LogisticPrior())


def _encoding_kwargs(task) -> dict:
    """Per-encoding extra kwargs from the task's ablation knobs."""
    if task.encoding_name in ("vardeq", "variational_dequantization"):
        return {"num_blocks": task.vardeq_blocks,
                "hidden_dim": task.vardeq_hidden,
                "num_mixtures": task.vardeq_mixtures}
    if (task.encoding_name in ("mixture", "mixture_model")
            and task.decoder != "bayes"):
        return {"decoder": task.decoder}
    return {}


@dataclasses.dataclass
class SetShufflingTask(TaskTemplate):
    """Uniform over permutations of S tokens."""

    set_size: int = 16
    batch_size: int = 1024
    encoding_dim: int = 4
    encoding_name: str = "mixture"
    num_layers: int = 8
    hidden_dim: int = 96
    num_mixtures: int = 8
    eval_batches_count: int = 4
    compute_dtype: str = "float32"
    # Ablation knobs (VERDICT r2 next #7): the learned-decoder arm (C13)
    # and a capacity-configurable dequant flow so the vardeq cell can be
    # capacity-matched to the paper's ≈3.0 baseline instead of the
    # deliberately-minimal 2-block/64-wide default.
    decoder: str = "bayes"
    vardeq_blocks: int = 2
    vardeq_hidden: int = 64
    vardeq_mixtures: int = 4
    # remat trades HBM activation traffic for recompute FLOPs — the right
    # direction for this memory-bound step (PERFORMANCE.md roofline);
    # exposed for the bench's lever probe (CNF_BENCH_REMAT).
    remat: bool = False
    # fused routes the coupling nets through the whole-network Pallas
    # kernel (ops/pallas/fused_transformer.py) — one HBM read + write per
    # net instead of ~20 intermediate round-trips.
    fused: bool = False
    # scan_blocks: True = lax.scan stack, False = unrolled, None = auto
    # (unrolled at <=8 layers — +37% measured on the flagship, see
    # build_set_flow docstring; scanned above for compile time/remat).
    scan_blocks: bool | None = None
    # lax.scan unroll factor for the scanned stack (hbm_util lever:
    # cross-block fusion; CNF_BENCH_UNROLL).
    unroll: int = 1
    name: str = "set_shuffling"

    def __post_init__(self):
        enc = encodings.create_encoding(
            self.encoding_name, num_categories=self.set_size,
            dim=self.encoding_dim,
            **_encoding_kwargs(self))
        self.model = CategoricalFlow(
            encoding=enc,
            flow=build_set_flow(enc.dim, self.num_layers, self.hidden_dim,
                                num_mixtures=self.num_mixtures,
                                compute_dtype=self.compute_dtype,
                                remat=self.remat, fused=self.fused,
                                scan_blocks=self.scan_blocks,
                                unroll=self.unroll))

    def _gen(self, rng: np.random.Generator, n: int) -> np.ndarray:
        out = native_loader.gen_permutations(
            int(rng.integers(2**62)), n, self.set_size)
        if out is not None:
            return out
        return np.argsort(
            rng.random((n, self.set_size)), axis=1).astype(np.int32)

    def train_batches(self, rng: np.random.Generator) -> Iterator[dict]:
        while True:
            yield {"x": self._gen(rng, self.batch_size)}

    def eval_batches(self) -> list[dict]:
        rng = np.random.default_rng(1234)
        return [{"x": self._gen(rng, self.batch_size)}
                for _ in range(self.eval_batches_count)]

    def analytic_optimum_bpd(self) -> float:
        return math.log2(math.factorial(self.set_size)) / self.set_size

    def sample_metrics(self, params, rng, num_samples: int | None = None,
                       temperature: float = 1.0) -> dict:
        """Fraction of sampled sequences that are exact permutations."""
        x = _sample_set(self.model, params, rng, num_samples or 1024,
                        self.set_size, temperature)
        is_perm = (np.sort(x, axis=1)
                   == np.arange(self.set_size)[None, :]).all(axis=1)
        return {"permutation_validity": float(is_perm.mean()),
                "metric_num_samples": float(len(x))}


def _sample_set(model, params, rng, num_samples: int, set_size: int,
                temperature: float) -> np.ndarray:
    """Chunked jitted sampling; temperature rides as a TRACED scalar so a
    temperature sweep (sample_eval CLI) reuses one compiled executable."""
    chunk = min(num_samples, 1024)
    fn = jax.jit(lambda p, k, t: model.sample(p, k, batch=chunk,
                                              num_pos=set_size,
                                              temperature=t))
    out, done = [], 0
    while done < num_samples:
        rng, k = jax.random.split(rng)
        out.append(np.asarray(fn(params, k, temperature)))
        done += chunk
    return np.concatenate(out)[:num_samples]


@lru_cache(maxsize=None)
def _count_sum_sequences(length: int, num_cat: int, target: int) -> int:
    """# of sequences in {1..K}^length with sum == target (counting DP)."""
    dp = np.zeros(target + 1, dtype=object)
    dp[0] = 1
    for _ in range(length):
        new = np.zeros(target + 1, dtype=object)
        for s in range(target + 1):
            if dp[s]:
                for v in range(1, num_cat + 1):
                    if s + v <= target:
                        new[s + v] += dp[s]
        dp = new
    return int(dp[target])


@dataclasses.dataclass
class SetSummationTask(TaskTemplate):
    """Uniform over {1..K}^S sequences that sum to L (default L=E[sum])."""

    set_size: int = 16
    num_categories: int = 10
    target_sum: int = 0  # 0 -> round(S*(K+1)/2)
    batch_size: int = 1024
    encoding_dim: int = 4
    encoding_name: str = "mixture"
    num_layers: int = 8
    hidden_dim: int = 96
    num_mixtures: int = 8
    eval_batches_count: int = 4
    compute_dtype: str = "float32"
    decoder: str = "bayes"
    vardeq_blocks: int = 2
    vardeq_hidden: int = 64
    vardeq_mixtures: int = 4
    name: str = "set_summation"

    def __post_init__(self):
        if self.target_sum == 0:
            self.target_sum = round(self.set_size *
                                    (self.num_categories + 1) / 2)
        enc = encodings.create_encoding(
            self.encoding_name, num_categories=self.num_categories,
            dim=self.encoding_dim if self.encoding_name != "vardeq" else 1,
            **_encoding_kwargs(self))
        self.model = CategoricalFlow(
            encoding=enc,
            flow=build_set_flow(enc.dim, self.num_layers, self.hidden_dim,
                                num_mixtures=self.num_mixtures,
                                compute_dtype=self.compute_dtype))

    def _gen(self, rng: np.random.Generator, n: int) -> np.ndarray:
        """Rejection-sample uniform sum-constrained sequences (vectorized)."""
        native = native_loader.gen_sum_sequences(
            int(rng.integers(2**62)), n, self.set_size,
            self.num_categories, self.target_sum)
        if native is not None:
            return native
        out = np.empty((0, self.set_size), np.int32)
        while out.shape[0] < n:
            cand = rng.integers(1, self.num_categories + 1,
                                (4 * n, self.set_size))
            ok = cand.sum(axis=1) == self.target_sum
            out = np.concatenate([out, cand[ok].astype(np.int32)])
        # categories are 1..K -> shift to 0..K-1 for the encoding
        return out[:n] - 1

    def train_batches(self, rng: np.random.Generator) -> Iterator[dict]:
        while True:
            yield {"x": self._gen(rng, self.batch_size)}

    def eval_batches(self) -> list[dict]:
        rng = np.random.default_rng(1234)
        return [{"x": self._gen(rng, self.batch_size)}
                for _ in range(self.eval_batches_count)]

    def analytic_optimum_bpd(self) -> float:
        cnt = _count_sum_sequences(self.set_size, self.num_categories,
                                   self.target_sum)
        return math.log2(cnt) / self.set_size

    def sample_metrics(self, params, rng, num_samples: int | None = None,
                       temperature: float = 1.0) -> dict:
        """Fraction of sampled sequences hitting the target sum."""
        x = _sample_set(self.model, params, rng, num_samples or 1024,
                        self.set_size, temperature)
        ok = (x + 1).sum(axis=1) == self.target_sum
        return {"sum_validity": float(ok.mean()),
                "metric_num_samples": float(len(x))}
