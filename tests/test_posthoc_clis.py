"""End-to-end tests of the post-hoc evaluation CLIs.

``experiments/eval_bpd.py`` (large-IS bound on a finished run — the
reference's standalone ``TaskTemplate.test()``, SURVEY.md §3.2) and
``experiments/sample_eval.py`` (temperature sweep) are exercised as real
subprocesses against a tiny trained run, because their failure mode is
exactly the one unit tests of the library cannot see: a crash after an
expensive TPU eval when the CLI glue (arg parsing, load_run, metrics
append, JSON write) breaks.
"""

import json
import os
import subprocess
import sys

import pytest

from categoricalnf_tpu.tasks import SetShufflingTask
from categoricalnf_tpu.training import TrainConfig, Trainer
from categoricalnf_tpu.utils.config import save_config

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("posthoc") / "run")
    task = SetShufflingTask(set_size=8, batch_size=128, encoding_dim=2,
                            num_layers=3, hidden_dim=48, num_mixtures=4,
                            eval_batches_count=1)
    cfg = TrainConfig(num_steps=8, eval_every=8, eval_samples=1,
                      log_every=100, out_dir=out)
    save_config(out, {"task": "set_shuffling",
                      "args": {"set_size": 8, "batch_size": 128,
                               "encoding_dim": 2, "num_layers": 3,
                               "hidden_dim": 48, "num_mixtures": 4,
                               "compute_dtype": "float32"}})
    Trainer(task, cfg).train(resume=False)
    return out


def _cli(script, *args):
    env = dict(os.environ, CNF_PLATFORM="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "experiments", script), *args],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)


def test_eval_bpd_cli_appends_posthoc_row(tiny_run):
    r = _cli("eval_bpd.py", "--run", tiny_run, "--num_samples", "4",
             "--split", "test", "--max_batches", "1")
    assert r.returncode == 0, r.stderr[-2000:]
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row["prefix"] == "posthoc_test"
    assert row["num_importance_samples"] == 4
    assert row["partial"] is True
    # the analytic optimum is a hard lower bound for a valid IW estimate
    assert row["bpd"] >= 0.0
    with open(os.path.join(tiny_run, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert any(x.get("prefix") == "posthoc_test" for x in rows)


def test_eval_bpd_cli_no_write(tiny_run):
    before = open(os.path.join(tiny_run, "metrics.jsonl")).read()
    r = _cli("eval_bpd.py", "--run", tiny_run, "--num_samples", "2",
             "--split", "val", "--max_batches", "1", "--no_write")
    assert r.returncode == 0, r.stderr[-2000:]
    assert open(os.path.join(tiny_run, "metrics.jsonl")).read() == before


def test_sample_eval_cli_writes_sweep(tiny_run):
    # the "a:b:c" per-stage token (GraphCNF-only) must be dropped with a
    # notice on tasks without stage-temperature support, not crash
    r = _cli("sample_eval.py", "--run", tiny_run,
             "--temperatures", "1.0,0.7,1.0:0.8:1.0", "--num_samples", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "no per-stage temperature support" in r.stderr
    sweep = json.load(open(os.path.join(tiny_run, "temperature_sweep.json")))
    assert [row["temperature"] for row in sweep] == [1.0, 0.7]
    for row in sweep:
        assert row["num_samples"] == 64
        assert 0.0 <= row["permutation_validity"] <= 1.0
