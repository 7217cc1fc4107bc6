"""Serve a finished run over HTTP: samples, sample-quality metrics, info.

The deployment-facing counterpart of the training CLIs: restores the best
checkpoint of any run (``inference.load_run``), jit-compiles the task's
native sampler once, and answers JSON requests.  JAX execution is
serialized behind a lock (one device, one program at a time); the HTTP
layer is the stdlib server, so this runs in the zero-dependency
environment.  Reference parity note: the reference has no serving surface
at all (SURVEY.md §5) — this is new framework scope.

Endpoints:
  GET  /health        -> {"status": "ok", "task": ..., "step": N}
  GET  /info          -> the run's config.json contents
  POST /sample        -> {"num_samples": int, "temperature": float}
                         task-native payloads (molecules: atoms/bonds/
                         smiles/valid; LM: text; sets: token arrays;
                         coloring: adjacency/colors/valid)
  POST /sample_metrics-> same body; the task's sample_metrics dict

Usage:
    python experiments/serve.py --run runs/molecules_v5 --port 8787
    curl -s -X POST localhost:8787/sample \
        -d '{"num_samples": 4, "temperature": 0.85}'
"""

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from categoricalnf_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sample_payload(task, params, rng, n: int, temperature: float):
    """Task-native JSON-serializable samples."""
    from categoricalnf_tpu.tasks.graph_coloring import (GraphColoringTask,
                                                        coloring_validity)
    from categoricalnf_tpu.tasks.language import LanguageModelingTask
    from categoricalnf_tpu.tasks.molecules import MoleculeTask
    from categoricalnf_tpu.tasks.set_modeling import (SetShufflingTask,
                                                      SetSummationTask)

    if isinstance(task, MoleculeTask):
        from categoricalnf_tpu.data.smiles import graph_to_smiles
        from categoricalnf_tpu.tasks import chem
        atoms, edges, node_mask = task.sample_many(params, rng, n,
                                                   temperature)
        valid = chem.molecule_validity(atoms, edges, node_mask,
                                       check_connected=False)
        out = []
        for b in range(n):
            k = int(node_mask[b].sum())
            adj = chem.edges_to_dense(edges[b], task.max_nodes)[:k, :k]
            out.append({
                "atoms": [chem.ATOM_TYPES[a] for a in atoms[b, :k]],
                "bonds": [[int(i), int(j), int(adj[i, j])]
                          for i in range(k) for j in range(i + 1, k)
                          if adj[i, j] > 0],
                "smiles": graph_to_smiles(atoms[b, :k], adj),
                "valid": bool(valid[b]),
            })
        return out

    if isinstance(task, LanguageModelingTask):
        x = np.asarray(task.model.sample(
            params, rng, batch=n, num_pos=task.seq_len,
            temperature=jnp.float32(temperature)))
        return ["".join(task.corpus.vocab[i] for i in row) for row in x]

    if isinstance(task, GraphColoringTask):
        np_rng = np.random.default_rng(
            int(jax.random.randint(rng, (), 0, 2**31 - 1)))
        batch = task._gen(np_rng, n)
        x = np.asarray(task.model.sample(
            params, rng, batch=n, num_pos=task.max_nodes,
            cond={"adj": jnp.asarray(batch["cond"]["adj"])},
            mask=jnp.asarray(batch["mask"]),
            temperature=jnp.float32(temperature)))
        valid = coloring_validity(batch["cond"]["adj"], x, batch["mask"])
        out = []
        for b in range(n):
            k = int(batch["mask"][b].sum())
            adj = batch["cond"]["adj"][b][:k, :k]
            out.append({
                "edges": [[int(i), int(j)] for i in range(k)
                          for j in range(i + 1, k) if adj[i, j] > 0],
                "colors": [int(c) for c in x[b, :k]],
                "valid": bool(valid[b]),
            })
        return out

    if isinstance(task, (SetShufflingTask, SetSummationTask)):
        from categoricalnf_tpu.tasks.set_modeling import _sample_set
        x = _sample_set(task.model, params, rng, n, task.set_size,
                        jnp.float32(temperature))
        return [[int(v) for v in row] for row in x]

    raise ValueError(f"no sample payload for task {type(task).__name__}")


class RunServer:
    """Owns the restored run and serializes device work."""

    def __init__(self, run_dir: str, **overrides):
        from categoricalnf_tpu.inference import load_run
        from categoricalnf_tpu.utils.config import load_config
        self.handle = load_run(run_dir, **overrides)
        self.config = load_config(run_dir)
        self.lock = threading.Lock()
        self._counter = 0

    def _next_rng(self):
        self._counter += 1
        return jax.random.PRNGKey(self._counter)

    def health(self):
        return {"status": "ok", "task": self.handle.task.name,
                "step": self.handle.step}

    def sample(self, n: int, temperature: float):
        with self.lock:
            return _sample_payload(self.handle.task, self.handle.params,
                                   self._next_rng(), n, temperature)

    def sample_metrics(self, n: int, temperature: float):
        with self.lock:
            m = self.handle.task.sample_metrics(
                self.handle.params, self._next_rng(), num_samples=n,
                temperature=temperature)
            return {k: float(v) for k, v in m.items()}


def make_handler(server: RunServer):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/health":
                return self._send(200, server.health())
            if self.path == "/info":
                return self._send(200, server.config)
            return self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                n = int(body.get("num_samples", 8))
                t = float(body.get("temperature", 1.0))
                if not 1 <= n <= 65536:
                    raise ValueError(f"num_samples {n} out of [1, 65536]")
                if self.path == "/sample":
                    return self._send(200, {"samples": server.sample(n, t)})
                if self.path == "/sample_metrics":
                    return self._send(200, server.sample_metrics(n, t))
                return self._send(404,
                                  {"error": f"unknown path {self.path}"})
            except Exception as e:  # serve errors as JSON, keep serving
                return self._send(400, {"error": str(e)})

    return Handler


def main():
    ap = argparse.ArgumentParser(description="Serve a finished run")
    ap.add_argument("--run", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--compute_dtype", default=None,
                    help="override the run's compute dtype (e.g. float32)")
    args = ap.parse_args()
    overrides = ({"compute_dtype": args.compute_dtype}
                 if args.compute_dtype else {})
    server = RunServer(args.run, **overrides)
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(server))
    print(f"serving {args.run} (task {server.handle.task.name}, "
          f"step {server.handle.step}) on {args.host}:{httpd.server_port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
