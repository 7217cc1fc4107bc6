"""ctypes loader for the C++ data-generation runtime.

Builds ``datagen.cpp`` once per machine (cached under
``~/.cache/cnf_native``) with g++ -O3 and exposes typed numpy wrappers.
Falls back to ``None`` (callers keep their numpy paths) if no compiler is
available — the native path is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "datagen.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:16]
    cache = os.environ.get("CNF_NATIVE_CACHE",
                           os.path.expanduser("~/.cache/cnf_native"))
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"datagen_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", so_path + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("CNF_NATIVE", "1") == "0":
        return None
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u64, i64, i32 = ctypes.c_uint64, ctypes.c_int64, ctypes.c_int32
    pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.gen_permutations.argtypes = [u64, i64, i32, pi32]
    lib.gen_sum_sequences.argtypes = [u64, i64, i32, i32, i32, pi32]
    lib.gen_sum_sequences.restype = i64
    lib.markov_rollout.argtypes = [u64, pf64, i32, i64, i32, pi32]
    lib.chunk_corpus.argtypes = [u64, pi32, i64, i64, i32, pi32]
    _LIB = lib
    return _LIB


# -- numpy-typed wrappers ----------------------------------------------------


def gen_permutations(seed: int, n: int, S: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((n, S), np.int32)
    lib.gen_permutations(seed & (2**64 - 1), n, S, out)
    return out


def gen_sum_sequences(seed: int, n: int, S: int, K: int,
                      target: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or S > 512:
        return None
    out = np.empty((n, S), np.int32)
    lib.gen_sum_sequences(seed & (2**64 - 1), n, S, K, target, out)
    return out


def markov_rollout(seed: int, P: np.ndarray, length: int,
                   start: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    cdf = np.cumsum(np.asarray(P, np.float64), axis=1).copy()
    out = np.empty(length, np.int32)
    lib.markov_rollout(seed & (2**64 - 1), cdf, P.shape[0], length, start,
                       out)
    return out


def chunk_corpus(seed: int, stream: np.ndarray, n: int,
                 T: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    stream = np.ascontiguousarray(stream, np.int32)
    out = np.empty((n, T), np.int32)
    lib.chunk_corpus(seed & (2**64 - 1), stream, len(stream), n, T, out)
    return out
