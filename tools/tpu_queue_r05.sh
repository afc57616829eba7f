#!/usr/bin/env bash
# Round-5 TPU-blocked artifact queue, in priority order. The watcher
# (tools/tpu_watch_r05.sh) fires this automatically the moment the axon
# tunnel recovers; each step is independently restartable.
# Logs under /tmp/tpuq5_*.log.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $(date -u +%H:%M:%S) $name: $* ==="
  timeout "$TO" "$@" > "/tmp/tpuq5_$name.log" 2>&1
  echo "rc=$? ($name)"
  tail -3 "/tmp/tpuq5_$name.log"
}

# 1. headline benchmark (min-of-3 inside bench.py) — the round's #1 artifact
TO=3600 run bench python bench.py

# 2. per-lever measurement: same bench with the native SA lever reverted to
#    the python oracle — the SEGMENT_TRANSFER_PROFILE delta is the measured
#    native-SA win at bench scale
TO=3600 run bench_sapy env RESCAN_SA_ENGINE=python python bench.py

# 3. 5-scan warm-sequence e2e profile (fused driver)
TO=7200 run results python tools/run_eval_parity.py --n_scans 5 \
    --out RESULTS_r05.json

# 4. scoring-kernel roofline with measured launches
TO=5400 run roofline python tools/roofline_note.py --measure \
    --out ROOFLINE_r05.json

# 5. noisy bench-scale eval parity (TPU-scale res 16)
TO=10800 run noisy python tools/run_eval_parity.py --noisy \
    --out NOISY_RESULTS_TPU_r05.json

# 6. capacity runs (random rerun + control)
TO=3600 run capacity python tools/run_capacity.py --out CAPACITY_TPU_r05.json
TO=3600 run capacity_ctl python tools/run_capacity.py --control \
    --out CAPACITY_CONTROL_TPU_r05.json

echo "=== queue complete $(date -u +%H:%M:%S) ==="
