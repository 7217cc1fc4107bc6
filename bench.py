"""Benchmark harness: prints ONE JSON line for the driver.

Runs the flagship set-shuffling training configuration on the available
accelerator (single TPU chip under the driver) and reports training
throughput in samples/s plus a model-level roofline: analytic
FLOPs-per-step from XLA's cost analysis of the compiled step, FLOP/s, and
MFU against the chip's bf16 peak.  The reference never published
throughput (BASELINE.md), so ``vs_baseline`` is null.

Batch contents VARY per step (8-batch pool + donated chained state) so an
identical-arg replay can never report impossible times (CLAUDE.md gotcha).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

# Peak dense bf16 FLOP/s and HBM bandwidth (B/s) per chip by device kind
# (public spec sheets).  Both looked up the same way so hbm_util can never
# silently use the wrong chip's bandwidth (ADVICE r3).
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5": 459e12,          # v5p
    "TPU v5 lite": 197e12,     # v5e
    "TPU v5e": 197e12,
    "TPU v6 lite": 918e12,     # v6e / Trillium
    "TPU v6e": 918e12,
}
_PEAK_HBM = {
    "TPU v4": 1228e9,
    "TPU v5": 2765e9,          # v5p
    "TPU v5 lite": 819e9,      # v5e
    "TPU v5e": 819e9,
    "TPU v6 lite": 1640e9,     # v6e / Trillium
    "TPU v6e": 1640e9,
}


def _lookup(table, device) -> float | None:
    kind = getattr(device, "device_kind", "")
    # Longest prefix wins: "TPU v5 lite" (v5e, 197T) must match before
    # "TPU v5" (v5p, 459T) — same ordering rule as SMILES' Cl-before-C.
    best = None
    for k, v in table.items():
        if kind.startswith(k) and (best is None or len(k) > best[0]):
            best = (len(k), v)
    return best[1] if best else None


def peak_flops(device) -> float | None:
    return _lookup(_PEAK_BF16, device)


def peak_hbm(device) -> float | None:
    return _lookup(_PEAK_HBM, device)


def step_costs(compiled) -> tuple[float | None, float | None]:
    """(flops, bytes accessed) of one compiled step from XLA's cost
    analysis.  Bytes matter more than FLOPs here: the flagship step is
    memory-traffic-bound (PERFORMANCE.md round-3 diagnostic)."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = cost.get("flops")
        b = cost.get("bytes accessed")
        return (float(f) if f and f > 0 else None,
                float(b) if b and b > 0 else None)
    except Exception:  # noqa: BLE001 — older backends lack cost_analysis
        return None, None


def main():
    from categoricalnf_tpu.tasks import SetShufflingTask
    from categoricalnf_tpu.training.state import OptimizerConfig, TrainState
    from categoricalnf_tpu.utils.jax_setup import setup_jax
    setup_jax()

    # If the TPU tunnel is unreachable, fall back to CPU so the driver
    # still records a self-describing measurement instead of nothing.
    # The probe runs in a SUBPROCESS with a hard timeout because a dead
    # tunnel makes jax.devices() spin in the axon claim-retry loop for
    # ~30 min before erroring.  The JSON carries the device kind; a CPU
    # number is NOT comparable to the TPU rows in BENCH_r*.json.
    import os
    import subprocess
    import sys
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # The env var alone does NOT steer the axon plugin (CLAUDE.md
        # gotcha); force it in-process so a CPU sanity run can never
        # land on the TPU and contend with a live training.
        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS", "") not in ("",):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=240, check=True, capture_output=True)
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print("TPU tunnel unreachable (bounded probe failed); "
                  "falling back to CPU", flush=True)
            jax.config.update("jax_platforms", "cpu")

    batch_size = int(os.environ.get("CNF_BENCH_BATCH", "1024"))
    # remat defaults ON: +19.3% measured on the memory-bound step
    # (PERFORMANCE.md round-4 lever table), gradient-equivalence-tested,
    # and exposed as a product config (--remat on the experiment CLI).
    remat = os.environ.get("CNF_BENCH_REMAT", "1") not in ("", "0")
    fused = os.environ.get("CNF_BENCH_FUSED", "") not in ("", "0")
    # "auto" (default) = the product's auto policy: unrolled at <=8
    # layers (+37% measured round 5), scanned above.  "0"/"1" force.
    _scan_env = os.environ.get("CNF_BENCH_SCAN", "auto")
    scan = None if _scan_env == "auto" else _scan_env not in ("", "0")
    unroll = int(os.environ.get("CNF_BENCH_UNROLL", "1"))
    task = SetShufflingTask(set_size=16, batch_size=batch_size,
                            encoding_dim=4, num_layers=8, hidden_dim=96,
                            num_mixtures=8, compute_dtype="bfloat16",
                            remat=remat, fused=fused, scan_blocks=scan,
                            unroll=unroll)
    from categoricalnf_tpu import flows as _flows
    scan_resolved = any(isinstance(l, _flows.ScannedBlocks)
                        for l in task.model.flow.layers)
    rng = jax.random.PRNGKey(0)
    params = task.init_params(rng)
    tx = OptimizerConfig().build()
    state = TrainState.create(params, tx)

    # pool of distinct batches, cycled per step
    gen = task.train_batches(np.random.default_rng(0))
    pool = [{"x": jnp.asarray(next(gen)["x"])} for _ in range(8)]

    def make_train_step(t):
        def train_step(state, batch, rng):
            # per-step rng folds on state.step (same scheme as the Trainer)
            step_rng = jax.random.fold_in(rng, state.step)

            def loss_fn(p):
                return t.loss(p, batch, step_rng, 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=opt_state), loss
        return train_step

    train_step = make_train_step(task)

    # Multi-step dispatch (engine steps_per_call): K steps per device call
    # as a lax.scan over a [K, B, ...] stack — the product's fast path.
    # Amortizes the per-dispatch host<->device round-trip, which at ~2 ms
    # of compute per step through the TPU tunnel is a material fraction.
    K = int(os.environ.get("CNF_BENCH_K", "8"))
    # EVERY call (warmup + timed) gets its own [K, B, S] stack AND its own
    # folded rng: alternating two stacks was not enough — the axon runtime
    # replayed calls whose args matched a previous call (donation recycles
    # the state buffer address), reporting 394 TF/s on a 197 TF/s chip
    # (mfu 2.0).  Unique args per call make a replay impossible by
    # construction; the compute-floor assert below catches any new
    # variant of the artifact.
    n_warmup = 3
    n_calls = int(os.environ.get("CNF_BENCH_CALLS", "16"))
    stacks = [
        {"x": jnp.stack([jnp.asarray(next(gen)["x"]) for _ in range(K)])}
        for _ in range(n_warmup + n_calls)
    ]
    call_rngs = [jax.random.fold_in(rng, 10_000 + i)
                 for i in range(n_warmup + n_calls)]

    def multi_step(state, batches, rng):
        def body(st, b):
            return train_step(st, b, rng)

        return jax.lax.scan(body, state, batches)

    step = jax.jit(multi_step, donate_argnums=(0,))
    step.lower(state, stacks[0], rng).compile()
    # FLOPs from the SINGLE-step lowering: XLA's cost analysis counts a
    # scan body ONCE regardless of trip count, so the K-step call reports
    # the same figure as one step.  Using the single-step program keeps
    # the per-step FLOP methodology identical to BENCH_r02.
    # Cost analysis cannot see inside Pallas kernels, so when the fused
    # coupling-net path is on, analytic FLOPs come from the XLA-equivalent
    # (fused=False) program — same math, countable — and bytes/hbm_util
    # are omitted (they no longer describe the executed program).
    if fused:
        import dataclasses as _dc
        cost_step = make_train_step(_dc.replace(task, fused=False))
    else:
        cost_step = train_step
    single = jax.jit(cost_step).lower(
        jax.tree.map(lambda a: a, state), pool[0], rng).compile()
    flops, step_bytes = step_costs(single)
    if fused:
        step_bytes = None

    def force(x):
        # block_until_ready() is NOT a sync barrier on the axon tunnel
        # platform (it returned after enqueue: mfu 2.3 on a 197 TF/s
        # chip).  A device->host VALUE read cannot lie — the bytes only
        # exist once the chip has finished every prior call.
        return float(np.asarray(jax.tree.leaves(x)[0]).sum())

    # Warmup (donation means the traced step call re-uses the compiled fn)
    for i in range(n_warmup):
        state, loss = step(state, stacks[i], call_rngs[i])
    force(loss)

    # ≥100 timed steps: a 30-step window through the tunnel had visible
    # run-to-run jitter on the number that headlines every round
    # (VERDICT r2 weak #6).  Every call's batch stack and rng are unique
    # (see above), so an identical-arg replay cannot report impossible
    # times.
    n_steps = n_calls * K
    t0 = time.perf_counter()
    for i in range(n_warmup, n_warmup + n_calls):
        state, loss = step(state, stacks[i], call_rngs[i])
    force(loss)
    dt = time.perf_counter() - t0

    samples_per_s = n_steps * batch_size / dt
    dev = jax.devices()[0]
    out = {
        "metric": "set_shuffling_train_samples_per_s",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": None,
        "device": getattr(dev, "device_kind", None) or dev.platform,
        "batch_size": batch_size,
        "remat": remat,
        "fused": fused,
        "scan_blocks": scan_resolved,
        "unroll": unroll,
    }
    # Bytes reporting is independent of FLOPs availability (ADVICE r3).
    # Methodology caveat: flops/bytes come from the SINGLE-step compile's
    # cost analysis; the timed loop runs the K-scan program, whose fused
    # per-step HBM traffic can differ slightly (fusion across the scan
    # boundary).  Kept single-step so the figure is comparable across
    # rounds (BENCH_r02 onward).
    out["cost_methodology"] = "single-step compile; timed loop is K-scan"
    # Cost-analysis bytes are only physically meaningful for the scanned
    # unroll=1 program (the historical BENCH series).  Under scan
    # unroll>1 the unrolled body is counted once (ratio 1.81 at
    # unroll=4), and for the fully-unrolled flow the naive ratio reads
    # 2.25 — both above 1.0 physical bandwidth (round-5 sweep), so the
    # metric is omitted in those configs, exactly like the fused case.
    if unroll > 1 or not scan_resolved:
        step_bytes = None
    if step_bytes:
        out["bytes_per_step"] = round(step_bytes, 0)
        hbm = peak_hbm(dev)
        if hbm:
            # memory-roofline utilization: the binding bound for this
            # traffic-dominated step
            out["hbm_util"] = round(step_bytes * n_steps / dt / hbm, 4)
    if flops is not None:
        flops_per_s = flops * n_steps / dt
        out["flops_per_step"] = round(flops, 0)
        out["flops_per_s"] = round(flops_per_s, 0)
        peak = peak_flops(dev)
        if peak:
            out["mfu"] = round(flops_per_s / peak, 4)
            out["peak_bf16_flops"] = peak
            # A measurement above the chip's peak is physically
            # impossible — some new replay/caching artifact slipped past
            # the unique-args construction.  Flag it machine-readably so
            # the number can never be quoted as real.
            if flops_per_s > peak:
                out["integrity_alarm"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    # The TPU tunnel occasionally throws transient FailedPrecondition
    # errors; retry so the driver always records a measurement.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"bench attempt {attempt + 1} failed ({type(e).__name__}); "
                  "retrying in 120s", flush=True)
            time.sleep(120)
