"""ckpt_bundle.sh semantics: git-committed resume bundles that survive the
between-window machine resets (round-3 finding: ~/.cache is base-imaged
between windows, so ckpt_stash.sh alone cannot span them).

Runs the real script in a sandbox via CNF_REPO + CNF_BUNDLE_NO_GIT."""

import os
import subprocess

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                      "ckpt_bundle.sh")


def _sh(op, run, repo):
    return subprocess.run(
        ["bash", SCRIPT, op, run],
        env={**os.environ, "CNF_REPO": str(repo), "CNF_BUNDLE_NO_GIT": "1"},
        capture_output=True, text=True)


def _mk_ckpt(repo, run, sub, step, payload="x"):
    d = repo / "runs" / run / sub / f"step_{step:08d}"
    d.mkdir(parents=True, exist_ok=True)
    (d / "data").write_text(payload)


@pytest.fixture
def repo(tmp_path):
    return tmp_path


def test_roundtrip_last_and_best(repo):
    _mk_ckpt(repo, "r", "checkpoints_last", 42, "resume")
    _mk_ckpt(repo, "r", "checkpoints", 40, "best")
    (repo / "runs" / "r" / "config.json").write_text("{}")
    r = _sh("stash", "r", repo)
    assert r.returncode == 0, r.stderr
    assert (repo / "persist" / "r.tar.gz").exists()

    # wipe the run (window reset) and restore
    import shutil
    shutil.rmtree(repo / "runs" / "r" / "checkpoints_last")
    shutil.rmtree(repo / "runs" / "r" / "checkpoints")
    r = _sh("restore", "r", repo)
    assert r.returncode == 0, r.stderr
    assert (repo / "runs" / "r" / "checkpoints_last" / "step_00000042"
            / "data").read_text() == "resume"
    assert (repo / "runs" / "r" / "checkpoints" / "step_00000040"
            / "data").read_text() == "best"


def test_stash_picks_newest_and_skips_tmp(repo):
    _mk_ckpt(repo, "r", "checkpoints_last", 10, "old")
    _mk_ckpt(repo, "r", "checkpoints_last", 20, "new")
    # interrupted orbax save must never be bundled
    d = repo / "runs" / "r" / "checkpoints_last" / \
        "step_00000030.orbax-checkpoint-tmp-123"
    d.mkdir(parents=True)
    (d / "data").write_text("poison")
    assert _sh("stash", "r", repo).returncode == 0
    import shutil
    shutil.rmtree(repo / "runs" / "r")
    _sh("restore", "r", repo)
    root = repo / "runs" / "r" / "checkpoints_last"
    assert (root / "step_00000020" / "data").read_text() == "new"
    assert not (root / "step_00000010").exists()
    assert not list(root.glob("*tmp*"))


def test_restore_refuses_overwrite(repo):
    _mk_ckpt(repo, "r", "checkpoints_last", 5, "bundled")
    _sh("stash", "r", repo)
    import shutil
    shutil.rmtree(repo / "runs" / "r" / "checkpoints_last")
    _mk_ckpt(repo, "r", "checkpoints_last", 9, "live")
    r = _sh("restore", "r", repo)
    assert "not overwriting" in r.stdout
    assert (repo / "runs" / "r" / "checkpoints_last" / "step_00000009"
            / "data").read_text() == "live"


def test_restore_without_bundle_is_noop(repo):
    r = _sh("restore", "nosuch", repo)
    assert r.returncode == 0
    assert "no bundle" in r.stdout


def test_git_orphan_branch_roundtrip(repo):
    """Git mode (r5): stash stores the bundle as a parentless commit on
    refs/heads/bundles/<run> (force-replaced per stash — bounded history,
    VERDICT r4 #8); restore materializes the file from the branch after a
    workspace reset deletes the untracked persist/ dir."""
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    subprocess.run(["git", "config", "user.email", "t@t"], cwd=repo,
                   check=True)
    subprocess.run(["git", "config", "user.name", "t"], cwd=repo,
                   check=True)
    _mk_ckpt(repo, "r", "checkpoints_last", 7, "resume")

    def _git_sh(op):
        env = {**os.environ, "CNF_REPO": str(repo)}
        env.pop("CNF_BUNDLE_NO_GIT", None)
        return subprocess.run(["bash", SCRIPT, op, "r"], env=env,
                              capture_output=True, text=True)

    r = _git_sh("stash")
    assert r.returncode == 0, r.stderr
    assert "stored on refs/heads/bundles/r" in r.stdout
    tip1 = subprocess.run(["git", "rev-parse", "refs/heads/bundles/r"],
                          cwd=repo, capture_output=True, text=True)
    assert tip1.returncode == 0

    # idempotent re-stash: same content -> ref untouched
    r = _git_sh("stash")
    assert "bundle unchanged" in r.stdout

    # new content -> ref force-replaced, old commit unreachable
    _mk_ckpt(repo, "r", "checkpoints_last", 9, "resume2")
    r = _git_sh("stash")
    assert "stored on" in r.stdout
    tip2 = subprocess.run(["git", "rev-parse", "refs/heads/bundles/r"],
                          cwd=repo, capture_output=True, text=True)
    assert tip2.stdout != tip1.stdout
    parents = subprocess.run(
        ["git", "rev-list", "--count", "refs/heads/bundles/r"],
        cwd=repo, capture_output=True, text=True)
    assert parents.stdout.strip() == "1", "bundle commit must be parentless"

    # window reset: persist/ (untracked) and runs/ both vanish
    import shutil
    shutil.rmtree(repo / "persist")
    shutil.rmtree(repo / "runs")
    r = _git_sh("restore")
    assert r.returncode == 0, r.stderr
    assert "materialized" in r.stdout
    assert (repo / "runs" / "r" / "checkpoints_last" / "step_00000009"
            / "data").read_text() == "resume2"
