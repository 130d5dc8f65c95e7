"""Profiling + speed-of-light reporting (SURVEY.md §5; BASELINE requires
per-kernel roofline reporting).

- ``device_specs()``: peak FLOPs / HBM bandwidth of the attached chip.
- ``sol_report(...)``: roofline model — measured time vs. the max(compute,
  memory) bound for declared flops/bytes.
- ``timed(...)``: robust wall timing with a host-fetch completion barrier
  (the axon PJRT plugin's block_until_ready returns before execution
  finishes, so fetching is the only reliable sync).
- ``trace(...)``: jax.profiler wrapper for Perfetto/XProf dumps.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import numpy as np


@dataclasses.dataclass
class DeviceSpecs:
    name: str
    peak_flops_bf16: float  # FLOP/s
    peak_flops_f32: float
    hbm_bandwidth: float  # B/s


_KNOWN = {
    # TPU v5 lite (v5e): 197 TFLOPs bf16, ~394 TOPS int8, 819 GB/s HBM
    "v5 lite": DeviceSpecs("tpu_v5e", 197e12, 49e12, 819e9),
    "v5e": DeviceSpecs("tpu_v5e", 197e12, 49e12, 819e9),
    "v4": DeviceSpecs("tpu_v4", 275e12, 137e12, 1228e9),
    "cpu": DeviceSpecs("cpu", 1e11, 5e10, 5e10),
}


def device_specs() -> DeviceSpecs:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for key, spec in _KNOWN.items():
        if key in kind:
            return spec
    return _KNOWN["cpu"]


def sync(x) -> None:
    jax.block_until_ready(x)
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf)


def timed(f, *args, iters: int = 20, warmup: int = 2) -> float:
    """Median-of-runs wall time per call (seconds), host-fetch synced."""
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def sol_report(
    name: str, measured_s: float, flops: float = 0.0, bytes_accessed: float = 0.0,
    dtype: str = "f32",
) -> dict:
    """Roofline: achieved fraction of the compute/memory bound."""
    spec = device_specs()
    peak = spec.peak_flops_bf16 if dtype == "bf16" else spec.peak_flops_f32
    t_compute = flops / peak if flops else 0.0
    t_memory = bytes_accessed / spec.hbm_bandwidth if bytes_accessed else 0.0
    t_sol = max(t_compute, t_memory, 1e-12)
    return {
        "kernel": name,
        "device": spec.name,
        "measured_ms": measured_s * 1e3,
        "sol_ms": t_sol * 1e3,
        "sol_fraction": t_sol / measured_s if measured_s > 0 else 0.0,
        "bound": "compute" if t_compute >= t_memory else "memory",
    }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/slam_tpu_trace"):
    """Capture a Perfetto/XProf trace around a code block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight per-step host timer with summary stats (the engine's
    matcher-observer hook equivalent for wall time)."""

    def __init__(self):
        self.samples: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.samples.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.samples:
            return {}
        s = np.asarray(self.samples)
        return {
            "steps": len(s),
            "mean_ms": float(s.mean() * 1e3),
            "p50_ms": float(np.percentile(s, 50) * 1e3),
            "p95_ms": float(np.percentile(s, 95) * 1e3),
            "steps_per_sec": float(1.0 / s.mean()),
        }
