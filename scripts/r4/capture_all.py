"""Round-4 official capture: run bench.py for every preset and APPEND each
JSON row to TPU_BENCH_VARIANTS.jsonl (tag r4_official_<preset>), chip-health
tagged. The r3 truth-pass failure mode was bench output printed to a
terminal and never committed — this script IS the committed artifact path.

Env: PRESETS (csv, default all five), MIN_HBM (default 400 GB/s; 0 = no
gate), SLAM_BENCH_* pass through.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def chip_hbm():
    sys.path.insert(0, REPO)
    import bench
    return bench._chip_hbm_gbps()


def main():
    presets = os.environ.get(
        "PRESETS", "tiny,viny,viny_m3rsm,gmapping,full").split(",")
    min_hbm = float(os.environ.get("MIN_HBM", 400))
    h = chip_hbm()
    print(f"chip health: {h} GB/s HBM", file=sys.stderr)
    if min_hbm > 0 and h < min_hbm:
        print(f"UNHEALTHY window ({h} < {min_hbm} GB/s) — not capturing",
              file=sys.stderr)
        sys.exit(3)
    out_path = os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl")
    for preset in presets:
        env = dict(os.environ, SLAM_BENCH_NO_PROBE="1",
                   SLAM_BENCH_PRESET=preset)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=2400,
        )
        line = ""
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                line = ln
        if not line:
            print(f"{preset}: bench produced no JSON (rc={r.returncode}):\n"
                  f"{r.stderr[-500:]}", file=sys.stderr)
            continue
        row = json.loads(line)
        row.update({
            "tag": f"r4_official_{preset}", "ts": time.time(),
            "chip_hbm_gbps_pre": h, "capture_s": round(time.time() - t0, 1),
        })
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
        h = chip_hbm()  # refresh tag between presets


if __name__ == "__main__":
    main()
