"""C++ data-runtime tests: build, correctness, determinism, prefetcher."""

import numpy as np
import pytest

from categoricalnf_tpu.data import native_loader
from categoricalnf_tpu.data.prefetch import Prefetcher


def _lib_or_skip():
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_gen_permutations_valid_and_deterministic():
    _lib_or_skip()
    a = native_loader.gen_permutations(7, 64, 16)
    b = native_loader.gen_permutations(7, 64, 16)
    np.testing.assert_array_equal(a, b)
    for row in a:
        np.testing.assert_array_equal(np.sort(row), np.arange(16))
    c = native_loader.gen_permutations(8, 64, 16)
    assert not np.array_equal(a, c)
    # rows differ from each other (no stuck RNG)
    assert len({tuple(r) for r in a}) > 60


def test_gen_permutations_uniformity():
    _lib_or_skip()
    # position 0 should be ~uniform over categories
    a = native_loader.gen_permutations(123, 20000, 8)
    counts = np.bincount(a[:, 0], minlength=8) / 20000
    np.testing.assert_allclose(counts, 1 / 8, atol=0.02)


def test_gen_sum_sequences():
    _lib_or_skip()
    S, K, target = 12, 9, 5 * 12
    a = native_loader.gen_sum_sequences(3, 128, S, K, target)
    assert a.shape == (128, S)
    assert a.min() >= 0 and a.max() <= K - 1
    np.testing.assert_array_equal((a + 1).sum(axis=1),
                                  np.full(128, target))


def test_markov_rollout_statistics():
    _lib_or_skip()
    rng = np.random.default_rng(0)
    P = rng.dirichlet([1.0] * 4, size=4)
    chain = native_loader.markov_rollout(11, P, 300_000, 0)
    counts = np.zeros((4, 4))
    np.add.at(counts, (chain[:-1], chain[1:]), 1)
    emp = counts / counts.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(emp, P, atol=0.02)


def test_chunk_corpus_contents():
    _lib_or_skip()
    stream = np.arange(10_000, dtype=np.int32)
    chunks = native_loader.chunk_corpus(5, stream, 32, 64)
    assert chunks.shape == (32, 64)
    for row in chunks:
        # every crop must be a contiguous run of the stream
        np.testing.assert_array_equal(np.diff(row), 1)


def test_prefetcher_preserves_order_and_propagates_errors():
    items = list(range(50))
    out = list(Prefetcher(iter(items)))
    assert out == items

    def boom():
        yield 1
        raise ValueError("gen failed")

    p = Prefetcher(boom())
    assert next(p) == 1
    with pytest.raises(ValueError):
        next(p)


def test_tasks_use_native_path():
    _lib_or_skip()
    from categoricalnf_tpu.tasks import SetShufflingTask
    t = SetShufflingTask(set_size=8, batch_size=16)
    x = next(t.train_batches(np.random.default_rng(0)))["x"]
    for row in x:
        np.testing.assert_array_equal(np.sort(row), np.arange(8))


def test_prefetcher_transform_runs_in_worker():
    import threading
    main = threading.get_ident()
    seen = []

    def tf(x):
        seen.append(threading.get_ident())
        return x * 10

    out = list(Prefetcher(iter([1, 2, 3]), transform=tf))
    assert out == [10, 20, 30]
    assert all(t != main for t in seen)  # H2D overlap happens off-thread

    def boom_tf(x):
        raise RuntimeError("transform failed")

    p = Prefetcher(iter([1]), transform=boom_tf)
    with pytest.raises(RuntimeError):
        next(p)
