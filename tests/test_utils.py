"""Utils + dispatch tests."""

import os

import numpy as np

from categoricalnf_tpu.ops.dispatch import _use_pallas
from categoricalnf_tpu.utils.config import (get_param_val, load_config,
                                            save_config, set_seed)
from categoricalnf_tpu.utils.debug import assert_finite_tree


def test_get_param_val_nested():
    cfg = {"a": {"b": {"c": 3}}, "x": 1}
    assert get_param_val(cfg, "a.b.c") == 3
    assert get_param_val(cfg, "x") == 1
    assert get_param_val(cfg, "missing", default=7) == 7
    try:
        get_param_val(cfg, "missing", allow_default=False)
        assert False
    except KeyError:
        pass


def test_save_load_config(tmp_path):
    path = save_config(str(tmp_path), {"lr": 1e-3, "name": "run"})
    assert os.path.exists(path)
    cfg = load_config(str(tmp_path))
    assert cfg["lr"] == 1e-3 and cfg["name"] == "run"
    assert load_config(str(tmp_path / "nope")) is None


def test_set_seed_deterministic():
    set_seed(3)
    a = np.random.rand(4)
    set_seed(3)
    b = np.random.rand(4)
    np.testing.assert_array_equal(a, b)


def test_dispatch_cpu_never_pallas():
    # tests run on the CPU platform: dispatch must always pick XLA
    assert not _use_pallas(1 << 22)


def test_dispatch_env_override(monkeypatch):
    monkeypatch.setenv("CNF_PALLAS", "0")
    assert not _use_pallas(1 << 22)


def test_assert_finite_tree():
    assert_finite_tree({"a": np.ones(3)}, "ok")
    try:
        assert_finite_tree({"a": np.asarray([1.0, np.nan])}, "bad")
        assert False
    except FloatingPointError as e:
        assert "bad" in str(e)


def test_check_resume_args_refuses_arch_drift(tmp_path):
    from categoricalnf_tpu.utils.cli import check_resume_args
    from categoricalnf_tpu.utils.config import save_config

    d = str(tmp_path)
    save_config(d, {"args": {"hidden_dim": 96, "edge_degree_norm": "nodes",
                             "lr": 1e-3}, "task": "t"})
    # training knobs may change freely
    check_resume_args(d, {"hidden_dim": 96, "edge_degree_norm": "nodes",
                          "lr": 5e-4, "num_steps": 99})
    # architecture flags may not - including parameter-shape-preserving
    # ones like edge_degree_norm
    import pytest
    with pytest.raises(ValueError, match="edge_degree_norm"):
        check_resume_args(d, {"hidden_dim": 96,
                              "edge_degree_norm": "live_edges"})
    with pytest.raises(ValueError, match="hidden_dim"):
        check_resume_args(d, {"hidden_dim": 128})
    # a fresh dir (no config) is fine
    check_resume_args(str(tmp_path / "nope"), {"hidden_dim": 1})


def test_check_resume_args_missing_key_falls_back_to_task_default(tmp_path):
    """A key absent from an old run's config means the run trained with the
    flag's default — resuming with a different value must still refuse."""
    import dataclasses

    import pytest

    from categoricalnf_tpu.utils.cli import check_resume_args
    from categoricalnf_tpu.utils.config import save_config

    @dataclasses.dataclass
    class FakeTask:
        edge_degree_norm: str = "nodes"
        encoding_name: str = "mixture"

    d = str(tmp_path)
    save_config(d, {"args": {"hidden_dim": 96}, "task": "t"})
    task = FakeTask()
    # old run predates the flag; default matches -> ok
    check_resume_args(d, {"edge_degree_norm": "nodes"}, task=task)
    # default differs -> refused even though the saved config lacks the key
    with pytest.raises(ValueError, match="edge_degree_norm"):
        check_resume_args(d, {"edge_degree_norm": "live_edges"}, task=task)
    # CLI-renamed keys resolve through inference._ARG_RENAMES
    with pytest.raises(ValueError, match="encoding"):
        check_resume_args(d, {"encoding": "vardeq"}, task=task)


def test_timing_sync_forces_value_read():
    """utils.timing.sync must return a real host float from any PyTree
    (the only trustworthy barrier on the tunnel platform — PERFORMANCE.md
    round-3 measurement-integrity discovery)."""
    import jax.numpy as jnp

    from categoricalnf_tpu.utils.timing import sync

    assert sync(jnp.arange(6.0).reshape(2, 3)) == 0.0
    assert sync({"a": jnp.full((4,), 7.0), "b": jnp.zeros(())}) == 7.0
    assert sync(jnp.asarray(3.5)) == 3.5
