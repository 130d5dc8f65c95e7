"""Round-5 official capture: run bench.py for every preset and APPEND
each JSON row to TPU_BENCH_VARIANTS.jsonl (tag r5_official_<preset>),
tagged with BOTH chip-health axes — delivered HBM GB/s AND tunnel event
latency (r5 finding: they are independent; the full pipeline is 988 ms
device-resident and bad rows come from 300-500 ms EVENTS, not bandwidth).

Env: PRESETS (csv; default all five + tiny_fast), MIN_HBM (default 400,
0 disables), MAX_EVENT_MS (default 120, 0 disables), SLAM_BENCH_* pass
through.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def health():
    import bench
    hbm = bench._chip_hbm_gbps()
    # event latency probed in a subprocess too (a hung chip must not hang
    # the capture loop)
    code = (
        "import sys; sys.path.insert(0, %r); import bench;"
        "import jax; print('EV', bench._event_ms())" % REPO
    )
    ev = -1.0
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=180,
                           capture_output=True, text=True)
        if "EV" in r.stdout:
            ev = float(r.stdout.rsplit("EV", 1)[1].split()[0])
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        pass
    return hbm, ev


def main():
    presets = os.environ.get(
        "PRESETS",
        "tiny,tiny_fast,viny,viny_m3rsm,gmapping,full,full_plain",
    ).split(",")
    min_hbm = float(os.environ.get("MIN_HBM", 400))
    max_ev = float(os.environ.get("MAX_EVENT_MS", 120))
    hbm, ev = health()
    print(f"chip health: {hbm} GB/s HBM, {ev} ms/event", file=sys.stderr)
    if (min_hbm > 0 and hbm < min_hbm) or (max_ev > 0 and 0 < ev > max_ev):
        print(f"UNHEALTHY window (hbm {hbm} < {min_hbm} or event {ev} > "
              f"{max_ev} ms) — not capturing", file=sys.stderr)
        sys.exit(3)
    out_path = os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl")
    for preset in presets:
        env = dict(os.environ, SLAM_BENCH_NO_PROBE="1",
                   SLAM_BENCH_PRESET=preset)
        if preset == "full_plain":
            env.update(SLAM_BENCH_PRESET="full", SLAM_BENCH_FULL_FAST="0")
        elif preset == "full_fast6":
            env.update(SLAM_BENCH_PRESET="full", SLAM_BENCH_FULL_ROUNDS="6")
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
            "tag": f"r5_official_{preset}", "ts": time.time(),
            "chip_hbm_gbps_pre": hbm, "event_ms_pre": ev,
            "capture_s": round(time.time() - t0, 1),
        })
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
        hbm, ev = health()  # refresh tags between presets


if __name__ == "__main__":
    main()
