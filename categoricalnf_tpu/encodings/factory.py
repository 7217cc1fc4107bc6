"""Encoding factory (reference parity: ``create_encoding`` in
``layers/categorical_encoding/mutils.py``, SURVEY.md C14)."""

from __future__ import annotations

from categoricalnf_tpu.encodings.dequantization import VariationalDequantization
from categoricalnf_tpu.encodings.linear_flows import LinearFlowEncoding
from categoricalnf_tpu.encodings.mixture import MixtureEncoding


def create_encoding(name: str, num_categories: int, dim: int = 2, **kw):
    """Build an encoding by name: mixture | linear_flows | vardeq."""
    if name in ("mixture", "mixture_model"):
        return MixtureEncoding(num_categories=num_categories, dim=dim, **kw)
    if name in ("linear_flows", "linear"):
        return LinearFlowEncoding(num_categories=num_categories, dim=dim, **kw)
    if name in ("vardeq", "variational_dequantization"):
        return VariationalDequantization(num_categories=num_categories,
                                         dim=1, **kw)
    raise ValueError(f"unknown encoding {name!r}")
