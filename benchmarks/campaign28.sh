#!/bin/bash
# Round-4 perf-probe slot (run when the chip is otherwise idle — after
# campaign27 or in a stop-file pause).  Measures the fused-extract kernel
# against the remat baseline and localizes the best execution config for
# the flagship bench default.  ~10 min per fresh-program probe (remote
# Mosaic/XLA compile through the tunnel; persistent cache makes repeats
# fast).
set -u
cd /root/repo
LOG=/tmp/campaign28
mkdir -p "$LOG"

probe() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout -k 120 1800 env "$@" python bench.py > "$LOG/$name.json" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -1 "$LOG/$name.json"
}

# remat reference (default config)
probe remat_ref CNF_BENCH_REMAT=1
# fused-extract at three tile sizes (remat off: orthogonal lever)
probe fused_t128 CNF_BENCH_REMAT=0 CNF_BENCH_FUSED=1 CNF_FT_TILE_FWD=128 CNF_FT_TILE_BWD=128
probe fused_t256 CNF_BENCH_REMAT=0 CNF_BENCH_FUSED=1 CNF_FT_TILE_FWD=256 CNF_FT_TILE_BWD=256
probe fused_t64  CNF_BENCH_REMAT=0 CNF_BENCH_FUSED=1 CNF_FT_TILE_FWD=64 CNF_FT_TILE_BWD=64
# fused without the scan wrapper (scan saved-state layout suspect)
probe fused_noscan CNF_BENCH_REMAT=0 CNF_BENCH_FUSED=1 CNF_BENCH_SCAN=0
# batch scaling on the remat winner
probe remat_b2048 CNF_BENCH_REMAT=1 CNF_BENCH_BATCH=2048

# kernel-level: mixture inverse re-measurement (r2 ratios voided by the
# no-op-barrier discovery) + the fused coupling-net microbench
echo "=== kernel_bench start $(date -u +%H:%M:%S) ==="
timeout -k 120 2400 python benchmarks/kernel_bench.py > "$LOG/kernel_bench.log" 2>&1
echo "=== kernel_bench done (exit $?) ==="
tail -12 "$LOG/kernel_bench.log"

echo "campaign28 complete $(date -u +%H:%M:%S)"
