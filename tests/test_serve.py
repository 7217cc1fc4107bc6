"""Serving surface: restore a run, answer HTTP JSON requests.

Covers the new-scope deployment layer (experiments/serve.py): health,
info, task-native /sample payloads, /sample_metrics, and error paths.
"""

import http.client
import json
import threading

import numpy as np

from categoricalnf_tpu.tasks.set_modeling import SetShufflingTask
from categoricalnf_tpu.training import (OptimizerConfig, TrainConfig,
                                        Trainer)
from categoricalnf_tpu.utils.config import save_config


def _tiny_run(tmp_path):
    out = str(tmp_path / "run")
    task = SetShufflingTask(set_size=6, batch_size=64, num_layers=2,
                            hidden_dim=24, num_mixtures=3, encoding_dim=2,
                            compute_dtype="float32")
    cfg = TrainConfig(num_steps=6, eval_every=3, eval_samples=1,
                      log_every=3, out_dir=out,
                      optimizer=OptimizerConfig(learning_rate=1e-3))
    Trainer(task, cfg).train(resume=False)
    save_config(out, {"args": {"set_size": 6, "batch_size": 64,
                               "num_layers": 2, "hidden_dim": 24,
                               "num_mixtures": 3, "encoding_dim": 2,
                               "compute_dtype": "float32"},
                      "task": task.name})
    return out


def test_serve_endpoints(tmp_path):
    import sys
    sys.modules.pop("experiments.serve", None)
    from experiments.serve import RunServer, make_handler
    from http.server import ThreadingHTTPServer

    run_dir = _tiny_run(tmp_path)
    server = RunServer(run_dir)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        conn.request("GET", "/health")
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 200 and health["status"] == "ok"
        assert health["task"] == "set_shuffling"

        conn.request("GET", "/info")
        info = json.loads(conn.getresponse().read())
        assert info["args"]["set_size"] == 6

        body = json.dumps({"num_samples": 4, "temperature": 0.9})
        conn.request("POST", "/sample", body=body)
        r = conn.getresponse()
        samples = json.loads(r.read())["samples"]
        assert r.status == 200 and len(samples) == 4
        assert all(len(row) == 6 for row in samples)
        assert np.asarray(samples).dtype.kind == "i"

        conn.request("POST", "/sample_metrics",
                     body=json.dumps({"num_samples": 64}))
        m = json.loads(conn.getresponse().read())
        assert "permutation_validity" in m
        assert m["metric_num_samples"] == 64.0

        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404

        conn.request("POST", "/sample",
                     body=json.dumps({"num_samples": 0}))
        r = conn.getresponse()
        assert r.status == 400 and "error" in json.loads(r.read())
    finally:
        httpd.shutdown()
