"""Config utilities (reference parity: ``general/mutils.py``, SURVEY.md C22):
nested-dict parameter access, seeding, config snapshot for resume."""

from __future__ import annotations

import dataclasses
import json
import os
import random
from typing import Any, Optional

import numpy as np


def get_param_val(params: dict, key: str, default: Any = None,
                  allow_default: bool = True) -> Any:
    """Fetch ``key`` from a (possibly nested, dot-separated) config dict."""
    node = params
    for part in key.split("."):
        if not isinstance(node, dict) or part not in node:
            if allow_default:
                return default
            raise KeyError(f"missing required config key {key!r}")
        node = node[part]
    return node


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def save_config(out_dir: str, config: Any, name: str = "config.json") -> str:
    """Serialise a (dataclass or dict) config next to the checkpoints so a
    run can be reconstructed for resume (reference dumps argparse json)."""
    os.makedirs(out_dir, exist_ok=True)

    def enc(o):
        if dataclasses.is_dataclass(o) and not isinstance(o, type):
            return {"__dataclass__": type(o).__name__,
                    **dataclasses.asdict(o)}
        if isinstance(o, (np.integer, np.floating)):
            return o.item()
        return str(o)

    path = os.path.join(out_dir, name)
    with open(path, "w") as f:
        json.dump(config, f, default=enc, indent=2)
    return path


def load_config(out_dir: str, name: str = "config.json") -> Optional[dict]:
    path = os.path.join(out_dir, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
