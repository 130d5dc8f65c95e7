#!/bin/bash
# Round-3 speed-capture loop: the chip's throughput varies >2x over hours
# (r2: tiny=1254 scans/s; this morning: 461). Re-measure the candidate
# operating points periodically, tagging each batch with a chip-health
# reference, and keep the best healthy-window capture.
# Usage: nohup scripts/r3/speed_capture_loop.sh > /tmp/r3_capture_loop.log 2>&1 &
cd "$(dirname "$0")/../.."
N=${N:-12}          # batches
SLEEP=${SLEEP:-900} # seconds between batches
for i in $(seq 1 "$N"); do
  echo "=== batch $i/$N $(date) ==="
  timeout 1200 python scripts/r3/chip_health.py
  timeout 2400 env ABL=${ABL:-base,mw128,mw128_s2} MODE=speed \
    python scripts/r3/gm_op_point.py
  sleep "$SLEEP"
done
