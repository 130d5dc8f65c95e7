#!/bin/bash
# Round-4 health-gated official capture: probe HBM bandwidth every SLEEP s;
# when >= THRESH GB/s, run capture_all.py (appends chip-tagged rows for all
# five presets to TPU_BENCH_VARIANTS.jsonl) and exit.
cd "$(dirname "$0")/../.."
N=${N:-20}
SLEEP=${SLEEP:-600}
THRESH=${THRESH:-400}
for i in $(seq 1 "$N"); do
  echo "=== probe $i/$N $(date) ==="
  if MIN_HBM="$THRESH" timeout 7200 python scripts/r4/capture_all.py; then
    echo "CAPTURE COMPLETE $(date)"
    exit 0
  fi
  sleep "$SLEEP"
done
echo "no healthy window found in $N probes"
exit 1
