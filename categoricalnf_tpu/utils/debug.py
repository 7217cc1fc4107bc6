"""Debug / sanitizer helpers (SURVEY.md §5: race detection & sanitizers).

The reference has nothing here (single process).  The jit-world
equivalents: NaN interception, purity via chex assertions, and a
finite-check wrapper for train states.
"""

from __future__ import annotations

import os

import chex
import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True) -> None:
    """Global NaN interception (dev only — disables some fusions)."""
    jax.config.update("jax_debug_nans", enable)


def nan_checks_from_env() -> None:
    if os.environ.get("CNF_DEBUG_NANS", "0") == "1":
        enable_nan_checks(True)


def assert_finite_tree(tree, label: str = "tree") -> None:
    """Host-side check that every leaf of a PyTree is finite."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite leaves in {label}: {bad[:10]}")


def assert_shape(x, shape, label: str = "array") -> None:
    chex.assert_shape(x, shape)
