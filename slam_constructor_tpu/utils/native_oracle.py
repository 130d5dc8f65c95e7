"""ctypes loader for the native cross-validation oracles
(native/score_oracle.cpp). Test-facing; returns None without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB = os.path.join(_DIR, "libslamscore.so")
_SRC = os.path.join(_DIR, "score_oracle.cpp")

_cache = None


def lib():
    global _cache
    if _cache is not None:
        return _cache or None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            _cache = False
            return None
    try:
        l = ctypes.CDLL(_LIB)
    except OSError:
        _cache = False
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    l.slamscore_obstacle.restype = ctypes.c_float
    l.slamscore_obstacle.argtypes = [
        f32p, u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        f32p, f32p, u8p, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    l.slamscore_compose.argtypes = [f32p, f32p, f32p]
    _cache = l
    return l


def score_obstacle(view, scan, pose, unknown_prob=0.5, stride=1):
    """C++ oracle score (obstacle reducer); None if no native lib."""
    l = lib()
    if l is None:
        return None
    occ = np.ascontiguousarray(np.asarray(view.occ), np.float32)
    known = np.ascontiguousarray(np.asarray(view.known), np.uint8)
    ranges = np.ascontiguousarray(np.asarray(scan.ranges), np.float32)
    bearings = np.ascontiguousarray(np.asarray(scan.bearings), np.float32)
    valid = np.ascontiguousarray(np.asarray(scan.valid), np.uint8)
    origin = np.asarray(view.origin)
    p = np.asarray(pose, np.float32)
    return float(
        l.slamscore_obstacle(
            occ, known, occ.shape[0], occ.shape[1],
            float(origin[0]), float(origin[1]), float(view.scale),
            float(unknown_prob),
            ranges, bearings, valid, len(ranges),
            int(stride), float(p[0]), float(p[1]), float(p[2]),
        )
    )


def compose(a, b):
    l = lib()
    if l is None:
        return None
    out = np.zeros(3, np.float32)
    l.slamscore_compose(
        np.ascontiguousarray(a, np.float32),
        np.ascontiguousarray(b, np.float32), out,
    )
    return out
