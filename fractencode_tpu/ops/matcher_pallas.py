"""Pallas TPU kernel: fused all-pairs scoring + running argmin.

This is the device-side search kernel the reference only stubbed (its OpenCL
engine uploads everything and then runs a placeholder kernel body,
``/root/reference/gpu/opencl/OpenCLEncodingEngine.cpp:255-264``).  Design:

  * The [R, K] range tile stays resident in VMEM while the kernel sweeps
    codebook tiles [BM, K]; the pair scores ``[BR, BM]`` are produced by one
    ``dot_general`` on the MXU and never leave VMEM — materializing the full
    [R, D*T] score matrix in HBM (4 TB at 4K) is impossible, so the argmin
    epilogue must live inside the kernel.
  * The running (best_dist, best_idx) accumulators persist in VMEM scratch
    across the codebook grid dimension (TPU grids iterate the trailing axis
    sequentially per range tile).
  * Codebook columns are stored in *search order* ``m = d*T + (T-1-t)`` so
    that "first strict improvement" == the reference's tie-break (domain
    ascending, transform descending; see ``encode/matcher.py``).
  * Classifier pruning is a mask (mismatch -> +inf), not a gather — shapes
    stay static and the MXU tiles stay dense.

The (s, o) solve runs outside the kernel on the R winners only (cheap VPU
work), reusing the same ``solve_so`` as the jnp oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_search", "DEFAULT_BR", "DEFAULT_BM"]

DEFAULT_BR = 512  # ranges per program
DEFAULT_BM = 4096  # codebook columns per inner tile
# (swept on v5e at 2048^2: (512, 4096) and (1024, 2048) tie ~6% ahead of the
# (256, 2048) starting point)

_BIG = 3.0e38


def _search_kernel(
    a_ref,  # [BR, K] range tile
    sa_ref,  # [BR, 1] range sums
    sa2_ref,  # [BR, 1] range sums of squares
    c_ref,  # [BM, K] codebook tile (search order)
    sb_ref,  # [1, BM]
    sb2_ref,  # [1, BM]
    rcls_ref,  # [BR, 1] i32 range classes (or all-zero when disabled)
    ccls_ref,  # [1, BM] i32 codebook column classes
    dist_out,  # [BR, 1] f32
    idx_out,  # [BR, 1] i32
    best_dist,  # VMEM scratch [BR, 1] f32
    best_idx,  # VMEM scratch [BR, 1] i32
    *,
    bm: int,
    criterion: str,
    so_mode: str,
    s_max: float,
    inv_norm: float,
    k: int,
    use_classes: bool,
    m_valid: int,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_dist[:] = jnp.full_like(best_dist, _BIG)
        best_idx[:] = jnp.zeros_like(best_idx)

    a = a_ref[:]  # [BR, K]
    c = c_ref[:]  # [BM, K]
    # MXU: SumAB for all pairs in this tile.  HIGHEST precision keeps the
    # f32 distance algebra exact (see encode/matcher.py) — the multi-pass
    # bf16 decomposition is exact for 8-bit pixels x 0.25-quantized samples.
    ab = jax.lax.dot_general(
        a, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [BR, BM]

    sa = sa_ref[:]  # [BR, 1]
    sa2 = sa2_ref[:]  # [BR, 1]
    sb = sb_ref[:]  # [1, BM]
    sb2 = sb2_ref[:]  # [1, BM]
    n = float(k)

    # Keep the number of live [BR, BM] f32 temporaries minimal — they drive
    # the kernel's scoped-VMEM footprint (see _score_tile: centred-moments
    # identity for the 'ls' offset, general residual otherwise).
    dist = _score_tile(ab, sa, sa2, sb, sb2, criterion=criterion,
                       so_mode=so_mode, s_max=s_max, inv_norm=inv_norm, n=n)

    if use_classes:
        mask = rcls_ref[:] == ccls_ref[:]  # [BR, BM] via broadcast
        dist = jnp.where(mask, dist, _BIG)

    # mask padded codebook columns (static tail; their zero vectors would
    # otherwise produce NaN/spurious scores in the affine epilogue)
    col = j * bm + jax.lax.broadcasted_iota(jnp.int32, (1, bm), 1)
    dist = jnp.where(col < m_valid, dist, _BIG)

    # tile-local argmin (first occurrence = lowest column index)
    tile_min = jnp.min(dist, axis=1, keepdims=True)  # [BR, 1]
    tile_arg = jnp.argmin(dist, axis=1).reshape(-1, 1).astype(jnp.int32)  # [BR, 1]
    tile_arg = tile_arg + j * bm

    improved = tile_min < best_dist[:]
    best_idx[:] = jnp.where(improved, tile_arg, best_idx[:])
    best_dist[:] = jnp.where(improved, tile_min, best_dist[:])

    @pl.when(j == nj - 1)
    def _finalize():
        dist_out[:] = best_dist[:]
        idx_out[:] = best_idx[:]


def _score_tile(ab, sa, sa2, sb, sb2, *, criterion, so_mode, s_max, inv_norm, n):
    """Shared VPU epilogue: pair scores from the five sums (see kernel doc)."""
    if criterion == "raw":
        return (sa2 - 2.0 * ab + sb2) * inv_norm
    var_a = n * sa2 - sa * sa
    var_b = n * sb2 - sb * sb
    cov = n * ab - sa * sb
    if so_mode == "ls":
        s = jnp.where(jnp.abs(var_b) < 1e-5, 0.0,
                      cov / jnp.where(var_b == 0.0, 1.0, var_b))
        if s_max > 0.0:
            s = jnp.clip(s, -s_max, s_max)
        e = (var_a - 2.0 * s * cov + (s * s) * var_b) * (1.0 / n)
        return jnp.maximum(e, 0.0) * inv_norm
    den = n * sa2 - (sa - 1.0) * sa
    num = n * ab - sa * sb
    s = jnp.where(jnp.abs(den) < 1e-5, 0.0,
                  num / jnp.where(den == 0.0, 1.0, den))
    if s_max > 0.0:
        s = jnp.clip(s, -s_max, s_max)
    o = (sb - s * sa) * (1.0 / n)
    e = (sa2 + (s * s) * sb2 + n * o * o + 2.0 * s * o * sb
         - 2.0 * s * ab - 2.0 * o * sa)
    return jnp.maximum(e, 0.0) * inv_norm


def _classed_kernel(
    # scalar prefetch
    tile_class_ref,  # [NRT] i32 — class of each range tile
    col_tile_start_ref,  # [NC] i32 — first column tile of each class
    col_tile_count_ref,  # [NC] i32 — number of column tiles of each class
    col_end_ref,  # [NC] i32 — first invalid sorted-column index per class
    # tensors
    a_ref, sa_ref, sa2_ref,  # [BR, K], [BR, 1], [BR, 1]
    c_ref, sb_ref, sb2_ref,  # [BM, K], [1, BM], [1, BM]
    dist_out, idx_out,  # [BR, 1]
    best_dist, best_idx,  # VMEM scratch [BR, 1]
    *,
    bm: int,
    criterion: str,
    so_mode: str,
    s_max: float,
    inv_norm: float,
    k: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_dist[:] = jnp.full_like(best_dist, _BIG)
        best_idx[:] = jnp.zeros_like(best_idx)

    cls = tile_class_ref[i]
    active = j < col_tile_count_ref[cls]

    @pl.when(active)
    def _compute():
        ab = jax.lax.dot_general(
            a_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dist = _score_tile(
            ab, sa_ref[:], sa2_ref[:], sb_ref[:], sb2_ref[:],
            criterion=criterion, so_mode=so_mode, s_max=s_max,
            inv_norm=inv_norm, n=float(k),
        )
        col0 = (col_tile_start_ref[cls] + j) * bm
        col = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, bm), 1)
        dist = jnp.where(col < col_end_ref[cls], dist, _BIG)

        tile_min = jnp.min(dist, axis=1, keepdims=True)
        tile_arg = jnp.argmin(dist, axis=1).reshape(-1, 1).astype(jnp.int32) + col0
        improved = tile_min < best_dist[:]
        best_idx[:] = jnp.where(improved, tile_arg, best_idx[:])
        best_dist[:] = jnp.where(improved, tile_min, best_dist[:])

    @pl.when(j == nj - 1)
    def _finalize():
        dist_out[:] = best_dist[:]
        idx_out[:] = best_idx[:]


@functools.partial(
    jax.jit,
    static_argnames=("criterion", "so_mode", "s_max", "inv_norm",
                     "block_r", "block_m", "interpret"),
)
def fused_search_classed(
    ranges_sorted,  # [R_pad, K] f32 — class-sorted, tile-aligned
    sum_a_sorted,  # [R_pad]
    sum_a2_sorted,  # [R_pad]
    cb_sorted,  # [M_pad, K] f32 — class-sorted, tile-aligned columns
    sb_sorted,  # [M_pad]
    sb2_sorted,  # [M_pad]
    tile_class,  # [NRT] i32
    col_tile_start,  # [NC] i32 (in units of column tiles)
    col_tile_count,  # [NC] i32
    col_end,  # [NC] i32 (in sorted-column units)
    *,
    criterion: str,
    so_mode: str,
    s_max: float,
    inv_norm: float,
    block_r: int = DEFAULT_BR,
    block_m: int = DEFAULT_BM,
    interpret: bool = False,
):
    """Class-blocked search: each range tile only visits its class's column
    segment.  The grid is sized for the worst case but off-class tiles are
    predicated away (`pl.when`), so the matmul/epilogue cost is proportional
    to the classifier's surviving pair count (~1/6 with the 6-class
    brightness classifier) instead of the full cross product.

    Returns (best_dist [R_pad], best_idx [R_pad] in sorted-column units).
    """
    r_pad, k = ranges_sorted.shape
    m_pad = cb_sorted.shape[0]
    assert r_pad % block_r == 0 and m_pad % block_m == 0
    nrt = r_pad // block_r
    max_tiles = m_pad // block_m
    grid = (nrt, max_tiles)

    kernel = functools.partial(
        _classed_kernel,
        bm=block_m,
        criterion=criterion,
        so_mode=so_mode,
        s_max=s_max,
        inv_norm=inv_norm,
        k=k,
    )

    def col_index(i, j, tile_class, col_tile_start, col_tile_count, col_end):
        cls = tile_class[i]
        # clamp skipped iterations onto the class's last real tile so the
        # pipeline re-fetches the same block (no extra DMA) instead of
        # streaming unused codebook tiles
        jj = jnp.minimum(j, jnp.maximum(col_tile_count[cls] - 1, 0))
        return col_tile_start[cls] + jj

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, k), lambda i, j, *s: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j, *s: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j, *s: (i, 0)),
            pl.BlockSpec((block_m, k),
                         lambda i, j, *s: (col_index(i, j, *s), 0)),
            pl.BlockSpec((1, block_m),
                         lambda i, j, *s: (0, col_index(i, j, *s))),
            pl.BlockSpec((1, block_m),
                         lambda i, j, *s: (0, col_index(i, j, *s))),
        ],
        out_specs=[
            pl.BlockSpec((block_r, 1), lambda i, j, *s: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j, *s: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.int32),
        ],
    )

    vmem_bytes = min(
        96 * 1024 * 1024,
        (6 * block_r * block_m + 4 * block_m * k + 2 * block_r * k) * 4
        + 4 * 1024 * 1024,
    )
    dist, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(
        tile_class.astype(jnp.int32),
        col_tile_start.astype(jnp.int32),
        col_tile_count.astype(jnp.int32),
        col_end.astype(jnp.int32),
        ranges_sorted,
        sum_a_sorted.reshape(-1, 1),
        sum_a2_sorted.reshape(-1, 1),
        cb_sorted,
        sb_sorted.reshape(1, -1),
        sb2_sorted.reshape(1, -1),
    )
    return dist.reshape(-1), idx.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("criterion", "so_mode", "s_max", "inv_norm", "use_classes",
                     "m_valid", "block_r", "block_m", "interpret"),
)
def fused_search(
    ranges,  # [R, K] f32
    sum_a,  # [R] f32
    sum_a2,  # [R] f32
    codebook,  # [M, K] f32, columns in search order
    sum_b,  # [M] f32
    sum_b2,  # [M] f32
    range_classes,  # [R] i32 (zeros when use_classes=False)
    col_classes,  # [M] i32
    *,
    criterion: str,
    so_mode: str,
    s_max: float,
    inv_norm: float,
    use_classes: bool,
    m_valid: int | None = None,
    block_r: int = DEFAULT_BR,
    block_m: int = DEFAULT_BM,
    interpret: bool = False,
):
    """Returns (best_dist [R] f32, best_idx [R] i32 into the M axis).

    R must be a multiple of block_r and M a multiple of block_m (the encoder
    zero-pads; ``m_valid`` marks the real column count so the padded tail is
    masked inside the kernel).
    """
    r, k = ranges.shape
    m = codebook.shape[0]
    assert r % block_r == 0 and m % block_m == 0, (r, m, block_r, block_m)
    grid = (r // block_r, m // block_m)

    kernel = functools.partial(
        _search_kernel,
        bm=block_m,
        criterion=criterion,
        so_mode=so_mode,
        s_max=s_max,
        inv_norm=inv_norm,
        k=k,
        use_classes=use_classes,
        m_valid=m if m_valid is None else m_valid,
    )

    # VMEM budget: the epilogue keeps a handful of [block_r, block_m] f32
    # arrays live; give the compiler explicit headroom so large grids don't
    # trip the default 16M scoped limit.
    vmem_bytes = min(
        96 * 1024 * 1024,
        (6 * block_r * block_m + 4 * block_m * k + 2 * block_r * k) * 4
        + 4 * 1024 * 1024,
    )
    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        in_specs=[
            pl.BlockSpec((block_r, k), lambda i, j: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_m, k), lambda i, j: (j, 0)),
            pl.BlockSpec((1, block_m), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_m), lambda i, j: (0, j)),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, block_m), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        ranges,
        sum_a.reshape(-1, 1),
        sum_a2.reshape(-1, 1),
        codebook,
        sum_b.reshape(1, -1),
        sum_b2.reshape(1, -1),
        range_classes.reshape(-1, 1).astype(jnp.int32),
        col_classes.reshape(1, -1).astype(jnp.int32),
    )
    return dist.reshape(-1), idx.reshape(-1)
