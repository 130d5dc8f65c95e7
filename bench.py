"""Headline benchmark: SLAM throughput (scans/sec) on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/s", "vs_baseline": N/40}

Baseline semantics: the reference (single-core C++ ROS node) publishes no
scans/sec figure but runs real-time against rosbag playback at sensor rate
(~40 Hz, BASELINE.md). vs_baseline therefore reports multiples of 40
scans/s; the binding target is >= 10x (vs_baseline >= 10).

Workload (tinySLAM preset, BASELINE config[0] shape): 360-beam scans, 256^2
map at 0.1 m/cell, Monte-Carlo matcher (64 candidates x 12 rounds => 768
score evaluations/scan) + full map insertion per scan, whole sequence
device-resident via lax.scan. Synthetic cecum-corridor data (datasets are
unreachable offline — SURVEY.md §6).

Env knobs: SLAM_BENCH_SCANS (default 256), SLAM_BENCH_BEAMS (360),
SLAM_BENCH_MAP (256), SLAM_BENCH_PRESET (tiny|viny|gmapping),
SLAM_BENCH_DTYPE (float32|bfloat16 scoring-matmul operands),
SLAM_BENCH_STRIDE (matcher beam stride; the reference SPE's skip knob).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def _tpu_probe_once(timeout_s: float = 90.0) -> bool:
    """Probe TPU health in a subprocess: the axon tunnel sometimes hangs
    compute indefinitely while still listing the device; a hung probe must
    not take the benchmark down with it."""
    import subprocess
    import sys

    code = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "print(float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
        return r.returncode == 0 and "64.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _chip_hbm_gbps(timeout_s: float = 180.0) -> float:
    """Delivered HBM GB/s of a fixed 256 MB saxpy chain (subprocess so a
    hung chip can't take the bench down). The official capture should not
    silently record a bandwidth-starved co-tenant window as the
    framework's throughput."""
    import subprocess
    import sys

    # Slope between 4- and 16-iteration chains of a 256 MB saxpy: cancels
    # the tunnel's fetch latency AND measures the dimension that actually
    # throttles the (memory-bound) SLAM kernels — HBM bandwidth. The
    # session chip is co-tenanted: MXU peak stays near 100-213 TFLOPs
    # while delivered HBM swings ~150-725 GB/s across hours (r3
    # chip_health rows); gating on compute would always pass.
    code = (
        "import jax, numpy as np, jax.numpy as jnp, time;"
        "big=jnp.ones((64,1024,1024),jnp.float32);"
        "mk=lambda n: jax.jit(lambda c: jax.lax.scan(lambda x,_:"
        " (x*0.999+0.001,None),c,None,length=n)[0][0,0,0]);"
        "f4, f16 = mk(4), mk(16);"
        "float(np.asarray(f4(big))); float(np.asarray(f16(big)));"
        "t=time.perf_counter(); float(np.asarray(f4(big)));"
        "t4=time.perf_counter()-t;"
        "t=time.perf_counter(); float(np.asarray(f16(big)));"
        "t16=time.perf_counter()-t;"
        "per=max(t16-t4,1e-9)/12;"
        "print('GBPS', round(2*big.nbytes/per/1e9, 1)"
        " if t16>t4 else 0.0)"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
        if r.returncode == 0 and "GBPS" in r.stdout:
            return float(r.stdout.rsplit("GBPS", 1)[1].split()[0])
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        pass
    return 0.0


def _wait_for_healthy_chip() -> float:
    """Wait (bounded) for the chip to deliver at least
    SLAM_BENCH_MIN_HBM_GBPS (default 400) of delivered HBM bandwidth
    before the official capture; returns the last observed GB/s either
    way."""
    import sys
    import time as _time

    min_gbps = float(os.environ.get("SLAM_BENCH_MIN_HBM_GBPS", 400))
    window = float(os.environ.get("SLAM_BENCH_HEALTH_WINDOW", 900))
    interval = float(os.environ.get("SLAM_BENCH_PROBE_INTERVAL", 60))
    deadline = _time.monotonic() + window
    t = _chip_hbm_gbps()
    while t < min_gbps and _time.monotonic() < deadline:
        print(
            f"bench: chip delivering {t} GB/s HBM (< {min_gbps}); waiting "
            f"for a healthy window", file=sys.stderr,
        )
        _time.sleep(interval)
        t = _chip_hbm_gbps()
    return t


def _tpu_responsive() -> tuple[bool, int]:
    """Retry the probe across a window instead of giving up on one shot.

    Round-2 post-mortem: the official BENCH_r02 capture fell back to CPU
    (1.35x) on a single failed 90 s probe while the same evening's manual
    captures measured 23-31x on the chip — a transient tunnel outage at
    capture time must not throw away the round's headline number.  Probe
    every SLAM_BENCH_PROBE_INTERVAL s (default 60) for up to
    SLAM_BENCH_PROBE_WINDOW s (default 900); returns (up, attempts).
    """
    import sys
    import time as _time

    window = float(os.environ.get("SLAM_BENCH_PROBE_WINDOW", 900))
    interval = float(os.environ.get("SLAM_BENCH_PROBE_INTERVAL", 60))
    deadline = _time.monotonic() + window
    attempts = 0
    while True:
        attempts += 1
        if _tpu_probe_once():
            return True, attempts
        if _time.monotonic() >= deadline:
            return False, attempts
        print(
            f"bench: TPU probe {attempts} failed; retrying in {interval:.0f}s",
            file=sys.stderr,
        )
        _time.sleep(interval)


def _event_ms() -> float:
    """Current tunnel dispatch+fetch latency (one tiny jitted call + one
    scalar fetch). The chip's HBM GB/s and the tunnel's per-event latency
    are INDEPENDENT health axes (r5 seg_chain finding: the full pipeline
    costs 988 ms device-resident but bad-window rows read 3x that from
    ~4 events at 300-500 ms each); official rows carry both."""
    import numpy as np

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((1,), jnp.float32)
    float(np.asarray(f(x))[0])
    t0 = time.perf_counter()
    float(np.asarray(f(x))[0])
    return round((time.perf_counter() - t0) * 1e3, 1)


def main():
    # 512 scans: the tunnel's device->host fetch latency reaches hundreds
    # of ms in bad windows; a longer device-resident sequence amortizes it
    # (the metric is sustained scans/s, not launch latency)
    n_scans = int(os.environ.get("SLAM_BENCH_SCANS", 512))
    n_beams = int(os.environ.get("SLAM_BENCH_BEAMS", 360))
    map_size = int(os.environ.get("SLAM_BENCH_MAP", 256))
    preset = os.environ.get("SLAM_BENCH_PRESET", "tiny")

    backend = "device"
    probe_attempts = 0
    chip_hbm = None
    if not os.environ.get("SLAM_BENCH_NO_PROBE"):
        up, probe_attempts = _tpu_responsive()
        if not up:
            # hung/unavailable accelerator through the whole retry window:
            # fall back to CPU rather than hang, and say so loudly
            jax.config.update("jax_platforms", "cpu")
            backend = "cpu-fallback"
        else:
            chip_hbm = _wait_for_healthy_chip()

    from slam_constructor_tpu.models import engine as eng
    from slam_constructor_tpu.models import gmapping, tiny, viny
    from slam_constructor_tpu.ops import matchers, scoring
    from slam_constructor_tpu.utils import datagen

    sc = scoring.ScoringConfig(
        reducer="overlap",
        window=1,
        dtype=os.environ.get("SLAM_BENCH_DTYPE", "float32"),
        stride=int(os.environ.get("SLAM_BENCH_STRIDE", 1)),
    )
    occ, origin, scale = datagen.cecum_world()
    poses = datagen.rectangle_trajectory(step=9.6 / n_scans * 2)
    # tile the loop to n_scans steps
    reps = (n_scans + poses.shape[0] - 1) // poses.shape[0]
    poses = jnp.tile(poses, (reps, 1))[:n_scans]
    bearings = datagen.default_bearings(n_beams)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(0),
        odom_noise_xy=0.01, odom_noise_theta=0.005,
    )

    if preset == "gmapping":
        # the fast single-chip operating point (>=10x target): f32 one-hot
        # overlap scoring + usable-range windows; see gmapping.fast_config
        # and TPU_BENCH_VARIANTS gmapping_fast_*/gmapping_abl_* rows
        cfg = gmapping.fast_config(n_particles=30, map_size=map_size)
        state = gmapping.init_state(cfg)
        run = lambda s: gmapping.run_sequence(cfg, s, scans, odom)
        metric = "gmapping_scans_per_sec"
    elif preset == "viny_m3rsm":
        # vinySLAM with the M3RSM global matcher every scan, windowed level
        # scoring (BASELINE config coverage: all five presets on chip)
        cfg = viny.viny_m3rsm_config(map_size=map_size)
        state = eng.init_state(cfg)
        run = lambda s: eng.run_sequence(cfg, s, scans, odom)
        metric = "viny_m3rsm_scans_per_sec"
    elif preset == "full":
        # loop-closing pipeline, segmented device-resident tracking (one
        # host fetch per segment — round-3 task 4); throughput timed over
        # run_segments so keyframe/loop/optimize work is all included
        from slam_constructor_tpu.models import full, posegraph as pglib
        from slam_constructor_tpu.models import tiny as tinylib

        # Windowed fast tracker (tiny.fast_config, usable range 8 m +
        # stride 2) is the r5 DEFAULT: quality-neutral vs the full-map
        # tracker on the committed 5-seed 360-beam bench (post-graph-fix
        # rows: full_ms_fast_sall_bn_gfix 0.0707/0.0720 mean/max vs
        # full_ms_default_sall_bn_gfix 0.0708/0.0716; the window shrinks
        # matching's memory-bound sampling operands ~2.6x).
        # SLAM_BENCH_FULL_FAST=0 runs the full-map tracker (captured
        # side-by-side as full_plain in scripts/r5/capture_all.py).
        if os.environ.get("SLAM_BENCH_FULL_FAST", "1") not in ("", "0"):
            # SLAM_BENCH_FULL_ROUNDS: tracker MC annealing rounds (the
            # tiny_fast eval-count lever brought to the pipeline; gate
            # rows full_ms_fastr6/_fastr8_*_gfix before changing)
            rounds = int(os.environ.get("SLAM_BENCH_FULL_ROUNDS", 12))
            tracking = tinylib.fast_config(
                map_size=map_size, stride=2, mc_rounds=rounds)
        else:
            tracking = tinylib.tiny_config(map_size=map_size)

        def make_full():
            e = full.FullSlamEngine(
                full.FullConfig(
                    tracking=tracking,
                    graph=pglib.PoseGraphConfig(
                        keyframe_distance=0.7, min_index_gap=8,
                        max_candidates=4, local_map_size=120,
                    ),
                    # BA stage batching: re-optimize once per 8 accumulated
                    # loop constraints (the PP low-rate stage; per-loop
                    # optimization would run GN ~70x over this sequence)
                    optimize_every_loops=8,
                ),
                n_beams=n_beams,
            )
            return e

        # segment=512 = ONE fused dispatch for the whole sequence: closure
        # bursts fire at keyframe-batch cadence inside it (r4), so
        # correction latency no longer depends on the segment length —
        # the 5-seed 2-lap ATE cost of segmenting is small and now
        # MEASURABLE (post-graph-fix variance is ~0.001): whole-seq
        # full_ms_default_sall_bn_gfix 0.0708 vs segment-64
        # full_ms_default_s64_bn_gfix 0.0777 — ~10%, every seed. The
        # whole-seq default is both faster AND slightly better; shorten
        # segments only to bound host-visible correction latency. Each
        # extra segment boundary additionally costs a tunnel
        # dispatch that in bad windows runs 100-500 ms
        seg = int(os.environ.get("SLAM_BENCH_SEGMENT", 512))
        # the shared bench trajectory covers <1 lap of the ~27 m rectangle
        # at these scan counts — no revisits, so loop closure would sit
        # idle. The full pipeline gets a 2-lap version of the same loop so
        # the keyframe graph actually closes (throughput then includes
        # detect+optimize work at its real rate).
        lap = datagen.rectangle_trajectory(step=2 * 27.2 / n_scans)
        reps2 = (n_scans + lap.shape[0] - 1) // lap.shape[0]
        poses2 = jnp.tile(lap, (reps2, 1))[:n_scans]
        scans, odom, gt = datagen.synth_sequence(
            occ, origin, scale, poses2, bearings, jax.random.PRNGKey(0),
            odom_noise_xy=0.01, odom_noise_theta=0.005,
        )
        e = make_full()
        e.run(scans, odom, segment=seg)  # warmup/compile
        import numpy as np  # noqa: F811

        e2 = make_full()
        t0 = time.perf_counter()
        e2.run(scans, odom, segment=seg)
        np.asarray(e2.state.pose)
        dt = time.perf_counter() - t0
        sps = n_scans / dt
        out = {
            "metric": "full_scans_per_sec",
            "value": round(sps, 2),
            "unit": "scans/s",
            "vs_baseline": round(sps / 40.0, 2),
            "backend": f"{backend}:{jax.default_backend()}",
            "keyframes": int(e2.graph.n_kf),
            "loops": e2.total_loops,
        }
        if probe_attempts > 1 or backend != "device":
            out["probe_attempts"] = probe_attempts
        if chip_hbm is not None:
            out["chip_hbm_gbps"] = chip_hbm
        if backend == "device":
            out["event_ms"] = _event_ms()
        print(json.dumps(out))
        return
    elif preset == "tiny_fast":
        # reduced-eval tiny operating point (r4 tiny_rounds finding,
        # 5-seed-gated in r5): at BENCH noise r6b64 matches the r12b64
        # ship config (tiny_ms_r6b64_bn 0.0721/0.0744 mean/max vs
        # 0.0712/0.0719) for ~2x throughput. Under 2x odometry noise it
        # grows an outlier seed (tiny_ms_r6b64_qn max 0.1289) — use
        # mc_rounds=8 (0.0758/0.0794 qn) for noisy-odometry deployments.
        cfg = tiny.tiny_config(
            map_size=map_size, mc_rounds=6, mc_batch=64, scoring_cfg=sc
        )
        state = eng.init_state(cfg)
        run = lambda s: eng.run_sequence(cfg, s, scans, odom)
        metric = "tiny_fast_scans_per_sec"
    else:
        mk = viny.viny_config if preset == "viny" else tiny.tiny_config
        # only override the preset's scoring when the caller asked for a
        # specific dtype/stride: viny ships stride-2 matching as of r5
        # (committed 5-seed + speed rows) and the bench must measure the
        # SHIPPED preset, not a bench-local stride-1 variant (the r5
        # official viny capture initially lost 45% to exactly this)
        explicit = (
            os.environ.get("SLAM_BENCH_DTYPE")
            or os.environ.get("SLAM_BENCH_STRIDE")
        )
        cfg = mk(map_size=map_size, scoring_cfg=sc if explicit else None)
        state = eng.init_state(cfg)
        run = lambda s: eng.run_sequence(cfg, s, scans, odom)
        metric = f"{preset}_scans_per_sec"

    import numpy as np

    def sync(x):
        # axon PJRT's block_until_ready returns before execution completes;
        # a host fetch is the only reliable completion barrier
        jax.block_until_ready(x)
        np.asarray(x)

    # warmup/compile (run_sequence donates state; keep a pristine copy)
    state0 = jax.tree.map(lambda a: a.copy(), state)
    out = run(state)
    sync(out[1])

    t0 = time.perf_counter()
    out = run(state0)
    sync(out[1])
    dt = time.perf_counter() - t0

    sps = n_scans / dt
    if os.environ.get("SLAM_BENCH_KERNELS"):
        kernel_reports(scans, cfg)  # stderr; stdout stays one JSON line
    out = {
        "metric": metric,
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / 40.0, 2),
        "backend": f"{backend}:{jax.default_backend()}",
    }
    if probe_attempts > 1 or backend != "device":
        out["probe_attempts"] = probe_attempts
    if chip_hbm is not None:
        out["chip_hbm_gbps"] = chip_hbm
    if backend == "device":
        out["event_ms"] = _event_ms()
    print(json.dumps(out))


def kernel_reports(scans, cfg) -> None:
    """Per-kernel speed-of-light roofline reports (BASELINE requirement),
    written to stderr as JSON lines."""
    import sys

    import jax

    from slam_constructor_tpu.models import engine as eng
    from slam_constructor_tpu.ops import matchers, raycast, scoring
    from slam_constructor_tpu.utils import profiling

    state = eng.init_state(cfg) if hasattr(cfg, "cell_model") else None
    if state is None:
        return
    model = cfg.cell_model
    s0 = jax.tree.map(lambda a: a[0], scans)
    gm = raycast.insert_scan(state.gm, model, jnp.zeros(3), s0, cfg.beam)
    view = scoring.MapView.of(gm, model)
    h, w = view.occ.shape
    r = s0.n_beams
    k = 64
    cand = jnp.zeros((k, 3))

    reports = []
    for impl in ("matmul", "gather", "pallas"):
        try:
            sc = scoring.ScoringConfig(reducer="overlap", impl=impl)
            f = jax.jit(lambda v, s, c: scoring.score_poses(v, s, c, sc))
            t = profiling.timed(f, view, s0, cand, iters=10)
            n = k * r
            flops = 2.0 * n * h * w  # selection matmul dominates
            bytes_acc = 4.0 * (n * h + n * w + h * w + n * w)
            reports.append(
                profiling.sol_report(f"score_{impl}", t, flops, bytes_acc)
            )
        except Exception as e:  # pallas may be unavailable off-TPU
            reports.append({"kernel": f"score_{impl}", "error": str(e)[:100]})

    f = jax.jit(
        lambda g, p, s: raycast.insert_scan(g, model, p, s, cfg.beam)
    )
    t = profiling.timed(f, gm, jnp.zeros(3), s0, iters=10)
    n_samples = r * cfg.beam.n_free_samples(gm.scale)
    reports.append(
        profiling.sol_report(
            "insert_scan", t, 2.0 * n_samples * (h + w),
            4.0 * (2 * h * w + n_samples * 4),
        )
    )

    mc = cfg.matcher_cfg if cfg.matcher == "monte_carlo" else matchers.MonteCarloConfig()
    f = jax.jit(lambda v, s, p, key: matchers.monte_carlo_match(v, s, p, key, mc))
    t = profiling.timed(f, view, s0, jnp.zeros(3), jax.random.PRNGKey(0), iters=5)
    reports.append({"kernel": "mc_match_full", "measured_ms": t * 1e3})

    for rep in reports:
        print(json.dumps(rep), file=sys.stderr)


if __name__ == "__main__":
    main()
