#!/usr/bin/env bash
# Round-5 tunnel watcher: probe the axon TPU backend every ~6 min in a
# bounded subprocess; the moment a probe succeeds, mark /tmp/TPU_BACK and
# fire the round-5 artifact queue (tools/tpu_queue_r05.sh), then exit.
# Start with:  nohup bash tools/tpu_watch_r05.sh >> /tmp/tpu_watch5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

PROBE='import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", ds
print("TPU_PROBE_OK", len(ds), ds[0].platform)'

while true; do
  timeout 100 python -c "$PROBE" > /tmp/tpu_probe5.log 2>&1
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "$(date -u +%H:%M:%S) TPU_BACK: $(tail -1 /tmp/tpu_probe5.log)"
    date -u > /tmp/TPU_BACK
    bash tools/tpu_queue_r05.sh >> /tmp/tpu_queue5.log 2>&1
    echo "$(date -u +%H:%M:%S) queue finished"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) rc=$rc still down: $(tail -c 120 /tmp/tpu_probe5.log | tr '\n' ' ')"
  sleep 360
done
