"""Process-level JAX setup shared by CLIs, bench, and driver entry points.

Enables the persistent compilation cache (first compile of the big flow
stacks costs minutes through the TPU tunnel; subsequent processes reuse
it) and honours debug env toggles.
"""

from __future__ import annotations

import os

import jax


def setup_jax(cache_dir: str | None = None) -> None:
    # CNF_PLATFORM=cpu forces the backend regardless of an exported
    # JAX_PLATFORMS (which this environment pins to the TPU plugin and
    # which jax reads before user code runs — config.update is the only
    # override that works, see CLAUDE.md).
    platform = os.environ.get("CNF_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = cache_dir or os.environ.get(
        "CNF_JAX_CACHE", os.path.expanduser("~/.cache/cnf_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    if os.environ.get("CNF_DEBUG_NANS", "0") == "1":
        jax.config.update("jax_debug_nans", True)
