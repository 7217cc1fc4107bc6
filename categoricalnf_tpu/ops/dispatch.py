"""Backend dispatch for the mixture-CDF hot paths.

Measured on TPU v5e (benchmarks/kernel_bench.py): the Pallas rtsafe
inverse is 2-4x faster than the XLA while-loop once the problem is large
enough to amortise kernel launch (~2^17 elements); below that XLA wins.
The forward pass stays on XLA always — it fuses into the surrounding
coupling math (affine + masking) which a standalone kernel would break.

Env override: ``CNF_PALLAS=0`` forces the XLA path, ``CNF_PALLAS=1``
forces Pallas (used by the benchmarks).
"""

from __future__ import annotations

import os

import jax

from categoricalnf_tpu.ops import numerics as nm

_PALLAS_MIN_SIZE = 1 << 17
_TPU_BACKENDS = ("tpu", "axon")


def _use_pallas(size: int) -> bool:
    flag = os.environ.get("CNF_PALLAS", "auto")
    if flag == "0":
        return False
    if jax.default_backend() not in _TPU_BACKENDS:
        return False
    if flag == "1":
        return True
    return size >= _PALLAS_MIN_SIZE


def mixture_inverse(y, pi_logits, means, log_scales):
    """Invert x -> logit(MixLogCDF(x)); picks the fastest backend."""
    if _use_pallas(int(y.size)):
        from categoricalnf_tpu.ops.pallas.mixture import \
            mixture_inverse_pallas
        return mixture_inverse_pallas(y, pi_logits, means, log_scales)
    return nm.mixture_inverse_logit_cdf(y, pi_logits, means, log_scales)
