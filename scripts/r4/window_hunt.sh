#!/bin/bash
# Hunt healthy chip windows: every SLEEP s, probe HBM bandwidth; when >=
# THRESH GB/s run the two below-bar presets (full, gmapping) via bench.py
# and append tagged rows. Runs until N probes are exhausted.
cd "$(dirname "$0")/../.."
N=${N:-10}
SLEEP=${SLEEP:-900}
THRESH=${THRESH:-550}
for i in $(seq 1 "$N"); do
  H=$(timeout 600 python - <<'PY' 2>/dev/null
import sys, os
sys.path.insert(0, os.getcwd())
import bench
print("HBM", bench._chip_hbm_gbps())
PY
)
  HB=$(echo "$H" | sed -n 's/^HBM //p')
  echo "probe $i/$N $(date +%H:%M): ${HB:-fail} GB/s"
  if python3 -c "import sys; sys.exit(0 if float('${HB:-0}') >= ${THRESH} else 1)" 2>/dev/null; then
    echo "HEALTHY — capturing full + gmapping $(date +%H:%M)"
    for P in full full_fast gmapping; do
      EXTRA=""
      PRESET=$P
      if [ "$P" = full_fast ]; then PRESET=full; EXTRA=1; fi
      OUT=$(SLAM_BENCH_NO_PROBE=1 SLAM_BENCH_PRESET=$PRESET SLAM_BENCH_FULL_FAST=$EXTRA timeout 1500 python bench.py 2>/dev/null | tail -1)
      if [ -n "$OUT" ]; then
        echo "$OUT" | python3 -c "
import sys, json, time
row = json.loads(sys.stdin.readline())
row.update({'tag': 'r4_window_${i}_' + '$P', 'ts': time.time(), 'chip_hbm_gbps_pre': float('${HB:-0}')})
open('TPU_BENCH_VARIANTS.jsonl', 'a').write(json.dumps(row) + chr(10))
print(json.dumps(row))"
      fi
    done
  fi
  sleep "$SLEEP"
done
echo "window hunt done"
