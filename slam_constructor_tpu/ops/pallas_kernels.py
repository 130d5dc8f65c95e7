"""Pallas TPU kernels for the scoring hot path.

The MXU sampling path in ``scoring.py`` materializes [N, H] selection
matrices in HBM (~2x the useful traffic). This kernel fuses selection-matrix
construction + contraction in VMEM: the occupancy plane lives in VMEM
(256x256 f32 = 256 KB), each grid step builds the per-chunk bilinear weights
on the fly and contracts them against the plane without ever writing them
out. Falls back to interpret mode off-TPU (used by the CPU test suite).

Kernel: bilinear/overlap (extent=1) plane sampling at N fractional
coordinates — the exact math of the 'overlap' reducer with
``overlap_extent == 1``, including out-of-map coverage backfill with
``unknown_prob``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

#: points processed per grid step
CHUNK = 512


def _bilinear_kernel(plane_ref, rel_ref, unk_ref, out_ref):
    h, w = plane_ref.shape
    x = rel_ref[:, 0]  # [C] fractional col coords
    y = rel_ref[:, 1]  # [C] fractional row coords
    unknown = unk_ref[0, 0]

    def axis_weights(pos, n):
        # overlap of [pos-0.5, pos+0.5) with unit cells == bilinear weights
        i0 = jnp.floor(pos - 0.5)
        w0 = (i0 + 1.5 - pos).astype(jnp.float32)  # weight of cell i0
        iota = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], n), 1)
        i0i = i0.astype(jnp.int32)[:, None]
        a = jnp.where(iota == i0i, w0[:, None], 0.0)
        a = jnp.where(iota == i0i + 1, (1.0 - w0)[:, None], a)
        return a  # [C, n]; out-of-range cells simply never match the iota

    a = axis_weights(y, h)  # [C, H]
    b = axis_weights(x, w)  # [C, W]
    # precision=HIGHEST: preferred_element_type only pins the ACCUMULATOR;
    # without the precision pin the MXU truncates the OPERANDS to bf16
    # (~1e-3 per-point error). That silent truncation was the round-3
    # "Pallas sequential-tracking collapse": a one-shot probe showed max
    # |diff| 6.7e-4 vs the exact matmul path (bf16-scale, not fp32-scale),
    # and the systematic per-(pose, map) score bias broke the Monte-Carlo
    # matcher's keep-if-better loop over a sequentially fed-back map —
    # ATE collapsed to odometry level while one-shot checks looked "close".
    m = jax.lax.dot_general(
        a, plane_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [C, W]
    ssum = jnp.sum(m * b, axis=-1)
    coverage = jnp.sum(a, axis=-1) * jnp.sum(b, axis=-1)
    out_ref[:, 0] = ssum + (1.0 - coverage) * unknown


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_plane_bilinear(
    plane: jax.Array, rel: jax.Array, unknown_prob: float | jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Sample ``plane`` [H, W] at ``rel`` [N, 2] fractional (x, y) cell
    coords with cell-overlap (bilinear) weighting; OOB mass reads
    ``unknown_prob``. Matches scoring's 'overlap' reducer at extent 1."""
    n = rel.shape[0]
    pad = (-n) % CHUNK
    rel_p = jnp.pad(rel.astype(jnp.float32), ((0, pad), (0, 0)))
    unk = jnp.asarray(unknown_prob, jnp.float32).reshape(1, 1)

    grid = (rel_p.shape[0] // CHUNK,)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    out = pl.pallas_call(
        _bilinear_kernel,
        out_shape=jax.ShapeDtypeStruct((rel_p.shape[0], 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(plane.shape, lambda i: (0, 0)),  # whole plane
            pl.BlockSpec((CHUNK, 2), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((CHUNK, 1), lambda i: (i, 0)),
        interpret=interpret,
    )(plane.astype(jnp.float32), rel_p, unk)
    return out[:n, 0]


def available() -> bool:
    return _HAS_PLTPU


def sample_for_scoring(v: jax.Array, rel_flat: jax.Array, unknown: float) -> jax.Array:
    """Entry used by scoring.score_poses (impl='pallas'): compiled on TPU,
    interpreted elsewhere."""
    interpret = jax.default_backend() != "tpu"
    return sample_plane_bilinear(v, rel_flat, unknown, interpret=interpret)
