#!/bin/bash
# Pending real-TPU measurement runner: execute the outstanding
# measurements in priority order the moment the axon tunnel is back,
# logging everything to one file. Safe to re-run; each step is
# individually time-bounded so a hung remote compile can't eat the
# whole window.
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

# 2. fused kNN-2 kernel: sweep-vs-tile variant A/B + operating points
#    (v2 grid swap / keyed reduction / vpop folding — PERF.md pending)
STEP_TIMEOUT=2400 run knn2_ab python benchmarks/exp_r3l_pallas_match.py --quick
STEP_TIMEOUT=2400 run knn2_4m python benchmarks/exp_r3l_pallas_match.py

# 3. on-device bit-equivalence scan-vs-fused at 1M + fused throughput
STEP_TIMEOUT=1800 run bigdb_1m python benchmarks/bench_large_db.py --kernel both
# 4. 16M-descriptor scaling point (device-generated DB, no upload)
STEP_TIMEOUT=1800 run bigdb_16m python benchmarks/bench_large_db.py \
  --db-size 16777216 --device-db --kernel fused --iters 5

# 5. e2e localization against the 1M-descriptor DB (serving config):
#    scan vs fused vs fused+pre-laid layout
STEP_TIMEOUT=2400 run loc_bigdb python benchmarks/bench_localize_bigdb.py

echo "==== backlog done $(date -u) ====" | tee -a "$LOG"
