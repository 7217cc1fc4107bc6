from categoricalnf_tpu.data import native_loader
from categoricalnf_tpu.data.prefetch import Prefetcher

__all__ = ["native_loader", "Prefetcher"]
