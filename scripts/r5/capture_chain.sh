#!/bin/bash
# r5 capture chain: run every r5 harness sequentially on the chip.
# Each step is independent (|| true): a hung/failed step doesn't kill
# the chain. Rows land in TPU_MEASURES.jsonl / TPU_BENCH_VARIANTS.jsonl.
cd "$(dirname "$0")/../.."
set -x
timeout 2400 python scripts/r5/tiny_multiseed.py || true
timeout 3000 python scripts/r5/viny_multiseed.py || true
timeout 3600 python scripts/r5/rbpf_struct.py || true
timeout 3000 python scripts/r5/detect_ab.py || true
timeout 2400 python scripts/r5/sol_capture.py || true
timeout 1800 python scripts/r5/seg_ab2.py || true
echo "capture chain done"
