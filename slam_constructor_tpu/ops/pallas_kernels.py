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


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def sample_plane_bilinear(
    plane: jax.Array, rel: jax.Array, unknown_prob: float | jax.Array,
    interpret: bool = False, chunk: int | None = None,
) -> jax.Array:
    """Sample ``plane`` [H, W] at ``rel`` [N, 2] fractional (x, y) cell
    coords with cell-overlap (bilinear) weighting; OOB mass reads
    ``unknown_prob``. Matches scoring's 'overlap' reducer at extent 1.

    ``chunk`` = points per grid step. Per-grid-step overhead is a few us,
    so small chunks leave the kernel launch-bound (r4: the vmapped 160^2
    RBPF case at CHUNK=512 ran 240 grid steps and lost to the matmul path
    on overhead alone); the [chunk, H]+[chunk, W] weight blocks must still
    fit VMEM next to the plane."""
    if chunk is None:
        chunk = CHUNK
    n = rel.shape[0]
    pad = (-n) % chunk
    rel_p = jnp.pad(rel.astype(jnp.float32), ((0, pad), (0, 0)))
    unk = jnp.asarray(unknown_prob, jnp.float32).reshape(1, 1)

    grid = (rel_p.shape[0] // chunk,)
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
            pl.BlockSpec((chunk, 2), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
        interpret=interpret,
        **kwargs,
    )(plane.astype(jnp.float32), rel_p, unk)
    return out[:n, 0]


def available() -> bool:
    return _HAS_PLTPU


def scoring_chunk(h: int, w: int) -> int:
    """Points per grid step for the scoring entry: as large as keeps the
    [chunk, H] + [chunk, W] weight blocks and the [chunk, W] partial inside
    a ~8 MB VMEM budget (grid-step overhead is a few us, so more points per
    step wins until VMEM pressure bites)."""
    budget = (8 << 20) // (4 * max(h, w) * 3)
    c = 512
    while c * 2 <= min(budget, 4096):
        c *= 2
    return c


def sample_for_scoring(v: jax.Array, rel_flat: jax.Array, unknown: float) -> jax.Array:
    """Entry used by scoring.score_poses (impl='pallas'): compiled on TPU,
    interpreted elsewhere."""
    interpret = jax.default_backend() != "tpu"
    return sample_plane_bilinear(
        v, rel_flat, unknown, interpret=interpret,
        chunk=scoring_chunk(*v.shape),
    )


# --- fused polar free-space range lookup (insert hot path) -------------------
#
# raycast._polar_free_plane builds the free-space weight plane as ~10 XLA
# ops — coordinate math plus a chunked lax.map of one-hot range-lookup
# matmuls; at 256^2 the whole insert measured 41 us against a 2.8 us
# roofline (SOL_r03 insert_tiny_blur = 6.7% SOL) — the pass is LAUNCH-
# bound (~10 small kernels of a few us each), not bandwidth-bound. This
# kernel collapses the lax.map chain into ONE launch: per row-block, the
# precomputed bearing-bin plane selects each cell's effective beam range
# via a one-hot matmul against the [R] range vector held in VMEM, and the
# free mask + weight select happens in the same pass. The trig planes
# (bin, distance, weight) are computed OUTSIDE by the same XLA
# expressions as the polar path — Pallas TPU has no atan2 lowering, and
# reimplementing it would shift fp knife edges; as structured the output
# is bitwise the XLA polar pass.

_FREE_BH = 8  # map rows per grid step ([BH*W, R] one-hot stays ~3 MB VMEM)


def _polar_lookup_kernel(
    r_n: int, rng_ref, bini_ref, d_ref, wgt_ref, sc_ref, out_ref
):
    # blocks are [8, C] tiles of the flattened plane (Mosaic min tile is
    # (8, 128) and has no layout cast for an in-kernel 2D->1D reshape, so
    # the flattening/padding happens outside); each of the 8 sublane rows
    # runs the (C,) -> (C, R) one-hot lookup that the scoring kernel uses
    hole_half = sc_ref[0, 0]
    max_range = sc_ref[0, 1]
    rows, c = bini_ref.shape
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (c, r_n), 1)
    for i in range(rows):  # static unroll (rows == 8)
        flat = bini_ref[i, :]
        oh = (flat[:, None] == iota_r).astype(jnp.float32)
        cr = jax.lax.dot_general(
            oh, rng_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [C, 1]
        cell_range = cr[:, 0]
        d = d_ref[i, :]
        free = (d < cell_range - hole_half) & (d < max_range)
        out_ref[i, :] = jnp.where(free, wgt_ref[i, :], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def polar_free_lookup(
    rng_eff: jax.Array,  # f32[R] per-beam effective free range
    bini: jax.Array,  # i32[H, W] bearing bin per cell (masked cells -> any)
    d: jax.Array,  # f32[H, W] distance from pose
    wgt: jax.Array,  # f32[H, W] crossing weight, 0 where out of FOV
    hole_half: jax.Array,
    max_range: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """One-launch per-cell range lookup + free select: out[c] = wgt[c] if
    d[c] < rng_eff[bini[c]] - hole_half and d[c] < max_range else 0."""
    h, w = d.shape
    r_n = rng_eff.shape[0]
    lane = 2048  # cells per sublane row ([lane, R] one-hot ~3 MB VMEM)
    tile = 8 * lane
    n = h * w
    pad = (-n) % tile
    n_rows = (n + pad) // lane

    def flat(a, fill):
        a = a.reshape(n)
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(n_rows, lane)

    bini2 = flat(bini, 0)
    d2 = flat(d, 0.0)
    wgt2 = flat(wgt, 0.0)  # padded cells carry zero weight -> output 0
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    sc = jnp.stack([
        jnp.asarray(hole_half, jnp.float32), jnp.asarray(max_range, jnp.float32)
    ]).reshape(1, 2)
    out = pl.pallas_call(
        functools.partial(_polar_lookup_kernel, r_n),
        out_shape=jax.ShapeDtypeStruct((n_rows, lane), jnp.float32),
        grid=(n_rows // 8,),
        in_specs=[
            pl.BlockSpec((r_n, 1), lambda i: (0, 0)),
            pl.BlockSpec((8, lane), lambda i: (i, 0)),
            pl.BlockSpec((8, lane), lambda i: (i, 0)),
            pl.BlockSpec((8, lane), lambda i: (i, 0)),
            pl.BlockSpec((1, 2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, lane), lambda i: (i, 0)),
        interpret=interpret,
        **kwargs,
    )(rng_eff.astype(jnp.float32).reshape(r_n, 1), bini2, d2, wgt2, sc)
    return out.reshape(n_rows * lane)[:n].reshape(h, w)
