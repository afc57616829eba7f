#!/usr/bin/env bash
# Round-4 TPU-blocked artifact queue, in priority order. Fire the moment
# the axon tunnel recovers (watcher: /tmp/tpu_watch.log says TPU_BACK).
# Each step is independently restartable; logs under /tmp/tpuq_*.log.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TO" "$@" > "/tmp/tpuq_$name.log" 2>&1
  echo "rc=$? ($name)"
  tail -3 "/tmp/tpuq_$name.log"
}

# 1. headline benchmark (min-of-3 inside bench.py)
TO=3600 run bench python bench.py

# 2. 5-scan warm-sequence profile with the round-4 ST levers
TO=7200 run results python tools/run_eval_parity.py --n_scans 5 \
    --out RESULTS_r04.json

# 3. scoring-kernel roofline with measured launches
TO=5400 run roofline python tools/roofline_note.py --measure \
    --out ROOFLINE_r04.json

# 4. noisy bench-scale eval parity (TPU-scale res 16)
TO=10800 run noisy python tools/run_eval_parity.py --noisy \
    --out NOISY_RESULTS_TPU_r04.json

# 5. capacity runs (random rerun + control)
TO=3600 run capacity python tools/run_capacity.py --out CAPACITY_TPU_r04.json
TO=3600 run capacity_ctl python tools/run_capacity.py --control \
    --out CAPACITY_CONTROL_r04.json

echo "=== queue complete ==="
