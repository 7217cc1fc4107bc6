"""ckpt_stash.sh semantics (ADVICE r2): tmp-dir exclusion, newest-step
restore, architecture-only config compare.  Runs the real script in a
sandbox via CNF_REPO/CNF_STASH overrides."""

import json
import os
import subprocess

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                      "ckpt_stash.sh")


def _sh(op, run, repo, stash):
    return subprocess.run(
        ["bash", SCRIPT, op, run],
        env={**os.environ, "CNF_REPO": str(repo), "CNF_STASH": str(stash)},
        capture_output=True, text=True)


def _mk_ckpt(root, run, sub, step, payload="x"):
    d = root / "runs" / run / sub / f"step_{step:08d}"
    d.mkdir(parents=True, exist_ok=True)
    (d / "data").write_text(payload)


def _cfg(root, run, args):
    d = root / "runs" / run
    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps({"args": args, "task": "t"}))


@pytest.fixture
def sandbox(tmp_path):
    repo = tmp_path / "repo"
    stash = tmp_path / "stash"
    repo.mkdir()
    stash.mkdir()
    return repo, stash


def test_stash_excludes_tmp_dirs(sandbox):
    repo, stash = sandbox
    _mk_ckpt(repo, "r", "checkpoints", 100)
    # interrupted orbax save debris must never reach the stash
    tmp = (repo / "runs" / "r" / "checkpoints"
           / "step_00000200.orbax-checkpoint-tmp-12345")
    tmp.mkdir(parents=True)
    _cfg(repo, "r", {"hidden_dim": 8})
    r = _sh("stash", "r", repo, stash)
    assert r.returncode == 0, r.stderr
    names = os.listdir(stash / "r" / "checkpoints")
    assert names == ["step_00000100"], names


def test_restore_takes_newer_side_per_subdir(sandbox):
    repo, stash = sandbox
    _cfg(repo, "r", {"hidden_dim": 8})
    # stash newer in checkpoints, dest newer in checkpoints_last
    _mk_ckpt(repo, "r", "checkpoints", 100, payload="old")
    _mk_ckpt(repo, "r", "checkpoints_last", 300, payload="dest")
    _sh("stash", "r", repo, stash)
    # advance the stash's checkpoints beyond the dest
    _mk_ckpt(repo, "r", "checkpoints", 200, payload="new")
    _sh("stash", "r", repo, stash)
    # stale the working tree: wipe and recreate older checkpoints
    import shutil
    shutil.rmtree(repo / "runs" / "r" / "checkpoints")
    _mk_ckpt(repo, "r", "checkpoints", 100, payload="stale")
    r = _sh("restore", "r", repo, stash)
    assert r.returncode == 0, r.stderr
    ck = sorted(os.listdir(repo / "runs" / "r" / "checkpoints"))
    assert "step_00000200" in ck, (ck, r.stdout)
    # checkpoints_last: dest (300) is not older than stash (300) -> kept
    assert "step_00000300" in os.listdir(
        repo / "runs" / "r" / "checkpoints_last")


def test_restore_refuses_architecture_mismatch_only(sandbox):
    repo, stash = sandbox
    _cfg(repo, "r", {"hidden_dim": 8, "eval_every": 100})
    _mk_ckpt(repo, "r", "checkpoints", 100)
    _sh("stash", "r", repo, stash)
    # runtime-knob change must NOT refuse (the ADVICE r2 failure: a
    # changed eval_every burned a window by restarting from step 0)
    _cfg(repo, "r", {"hidden_dim": 8, "eval_every": 999})
    r = _sh("restore", "r", repo, stash)
    assert r.returncode == 0, r.stdout + r.stderr
    # architecture change MUST refuse
    _cfg(repo, "r", {"hidden_dim": 16, "eval_every": 100})
    r = _sh("restore", "r", repo, stash)
    assert r.returncode == 1
    assert "ARCHITECTURE" in r.stdout


def test_restore_tolerates_keys_added_between_sessions(sandbox):
    repo, stash = sandbox
    _cfg(repo, "r", {"hidden_dim": 8})
    _mk_ckpt(repo, "r", "checkpoints", 100)
    _sh("stash", "r", repo, stash)
    # a flag added in a later session (other side trained with default)
    _cfg(repo, "r", {"hidden_dim": 8, "num_layers_bond": 0})
    r = _sh("restore", "r", repo, stash)
    assert r.returncode == 0, r.stdout + r.stderr
