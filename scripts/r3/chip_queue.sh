#!/bin/bash
# Round-3 sequential chip queue (one job at a time — concurrent chip jobs
# contend and corrupt timings). Run after any interactive chip work stops.
cd "$(dirname "$0")/../.."
set -x
timeout 1200 python scripts/r3/chip_health.py
timeout 2400 python scripts/r3/insert_breakdown.py
timeout 2400 env SLAM_BENCH_NO_PROBE=1 SLAM_BENCH_PRESET=viny_m3rsm python bench.py
timeout 3600 env SLAM_BENCH_NO_PROBE=1 SLAM_BENCH_PRESET=full python bench.py
timeout 2400 env ABL=base,base_s2,base_g55,base_s2_g55 MODE=speed python scripts/r3/gm_op_point.py
timeout 3600 env MODE=speed,quality python scripts/r3/cow_fast.py
timeout 1200 python scripts/r3/chip_health.py
echo "QUEUE DONE $(date)"
