#!/bin/bash
# TPU_TODO.md runner: execute the pending real-TPU measurements in
# priority order the moment the axon tunnel is back, logging everything
# to one file. Safe to re-run; each step is individually time-bounded so
# a hung remote compile can't eat the whole window.
#
# Usage:  bash benchmarks/run_tpu_backlog.sh [logfile]
LOG=${1:-/tmp/tpu_backlog.log}
cd "$(dirname "$0")/.." || exit 1
run() {
  local name=$1; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$LOG"
  timeout "$STEP_TIMEOUT" "$@" >>"$LOG" 2>&1
  echo "--- [$name] rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

echo "==== TPU backlog run $(date -u) ====" | tee -a "$LOG"

# 1. headline regression check (exact mode, 512^2, hardened protocol)
STEP_TIMEOUT=1200 run headline python bench.py

# 2. adaptive capacity ladder A/B (only unmeasured default-flip candidate)
STEP_TIMEOUT=2400 run ladder python benchmarks/exp_r3g_adaptive.py

# 3. stream scaling in micro-batch B (VERDICT r2 #3)
STEP_TIMEOUT=1200 run stream_b1 python benchmarks/bench_stream.py --batch 1
STEP_TIMEOUT=1200 run stream_b4 python benchmarks/bench_stream.py --batch 4
STEP_TIMEOUT=1200 run stream_b8 python benchmarks/bench_stream.py --batch 8

# 4. row-strip FED kernel vs XLA fallback at 1024/2048
STEP_TIMEOUT=1800 run fed_strip python benchmarks/bench_feature_extraction.py --sizes 1024,2048

# 5. reference-cap stress: 8192 px at capacity 262,143 (tiled merge on device)
STEP_TIMEOUT=2400 run cap262k python benchmarks/bench_feature_extraction.py --sizes 8192 --capacity 262143 --iters 3

# 6. hybrid descriptor mode e2e fps (fidelity already measured on CPU)
STEP_TIMEOUT=1800 run hybrid python benchmarks/exp_r3_e2e.py exact,fast,hybrid

echo "==== backlog done $(date -u) ====" | tee -a "$LOG"
