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

__all__ = ["fused_search", "fused_search_classed", "fused_search_pairs",
           "DEFAULT_BR", "DEFAULT_BM", "INT8_MAX_K", "PAIR_CAP"]

DEFAULT_BR = 512  # ranges per program
DEFAULT_BM = 4096  # codebook columns per inner tile
# (swept on v5e at 2048^2: (512, 4096) and (1024, 2048) tie ~6% ahead of the
# (256, 2048) starting point)

# Largest contraction K for which the int8 decomposition of SumAB is exact in
# f32 (see _pair_ab): |4*SumAB - 512*SumB| <= 4*K*255^2 must stay < 2^24.
# K=64 (8x8 ranges) fits; K=256 falls back to the f32 HIGHEST path.
INT8_MAX_K = 64

_BIG = 3.0e38


def _pair_ab_f32(a, c):
    """SumAB for all pairs: [BR, K] f32 x [BM, K] f32 -> [BR, BM] f32.

    HIGHEST precision keeps the f32 distance algebra exact — the multi-pass
    bf16 decomposition is exact for 8-bit pixels x 0.25-quantized samples.
    """
    return jax.lax.dot_general(
        a, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pair_ab_int8_raw(ai, ch, cl):
    """The two int8 MXU passes of the SumAB decomposition (see _pair_ab_int8):
    returns (abh, abl) i32 with 8*abh + abl = 4*SumAB - 512*SumB."""
    dn = (((1,), (1,)), ((), ()))
    abh = jax.lax.dot_general(ai, ch, dimension_numbers=dn,
                              preferred_element_type=jnp.int32)
    abl = jax.lax.dot_general(ai, cl, dimension_numbers=dn,
                              preferred_element_type=jnp.int32)
    return abh, abl


def _pair_ab_int8(ai, ch, cl, sb):
    """Exact SumAB from the int8 decomposition (~4x the HIGHEST-f32 MXU rate).

    Range pixels are 8-bit ints A in [0, 255]; codebook samples are 2x2-box
    averages, i.e. multiples of 0.25 in [0, 255] so B4 = 4*B is a 10-bit int.
    With ai = A - 128 (int8), ch = B4 >> 3 (7-bit), cl = B4 & 7 (3-bit):

        SumAB = 0.25 * (8*(ai.ch) + (ai.cl)) + 128*SumB

    Both dots are int8 x int8 -> i32 on the MXU (one native pass each vs the
    3+ passes of HIGHEST f32).  For K <= INT8_MAX_K the i32 combination and
    its f32 rendering are exact, so distances are bit-identical to the f32
    path.  ``sb`` is the [1, BM] SumB row that is already a kernel input.
    """
    abh, abl = _pair_ab_int8_raw(ai, ch, cl)
    return (8 * abh + abl).astype(jnp.float32) * 0.25 + 128.0 * sb


def _is_ls_fast(criterion: str, so_mode: str, s_max: float, use_int8: bool,
                threshold: float = 0.0) -> bool:
    # the early-accept frontier needs the per-row sums resident for the
    # in-kernel q -> dist conversion, so threshold mode uses the generic int8
    # path (bit-identical rank keys; see _rank_ls_int8's docstring)
    return use_int8 and threshold <= 0.0 and \
        rank_mode(criterion, so_mode, s_max) == "ls"


_BIG_I = 2**31 - 1


def _apply_frontier(q, sa, sa2, *, criterion, so_mode, s_max, inv_norm, n,
                    threshold, t_n):
    """Early-accept frontier within one column tile.

    Reproduces the reference's data-dependent scan exits
    (``TransformEstimator2.hpp:40-41``: break the domain loop once best <=
    rmsThreshold; ``transformmatcher.h:55-56``: break the transform loop at
    the first transform under threshold) as a prefix mask: let c0 be the
    first hit column and g its domain group (columns store transforms
    DESCENDING, so within the group the frontier keeps the suffix from the
    LAST hit column = the first hit transform in ascending-t order).  Beyond
    the frontier -> -_BIG.  The hit test converts q back to distance with
    rank_to_dist's exact f32 expression so kernel and oracle agree bitwise.

    Returns (masked q, any_hit [BR, 1] bool).
    """
    dist = rank_to_dist(q, sa2, sa, criterion=criterion, so_mode=so_mode,
                        s_max=s_max, inv_norm=inv_norm, n=n)
    hit = dist <= threshold
    ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    first_hit = jnp.min(jnp.where(hit, ids, _BIG_I), axis=1, keepdims=True)
    any_hit = first_hit < _BIG_I
    g_start = jnp.where(any_hit, (first_hit // t_n) * t_n, _BIG_I)
    in_g = (ids >= g_start) & (ids < g_start + t_n)
    c_star = jnp.max(jnp.where(hit & in_g, ids, -1), axis=1, keepdims=True)
    allowed = (ids < g_start) | (in_g & (ids >= c_star))
    return jnp.where((~any_hit) | allowed, q, -_BIG), any_hit


def _rank_ls_int8(ai, abh, abl, sb, aux, n: float):
    """Fused all-integer epilogue for the default ('ls' rank + int8) path.

    Exact identity (A := 8*abh + abl = 4*SumAB - 512*SumB, sb4 := 4*SumB):

        cov4 = 4*(n*SumAB - SumA*SumB) = n*A + (128*n - SumA) * sb4

    — every term fits i32 exactly for K <= INT8_MAX_K, so cov4 equals
    _cov_exact's value integer-for-integer.  SumA itself is derived from the
    resident int8 range tile (SumA = rowsum(ai) + 128*n, exact), so the
    kernel needs NO per-row sum inputs at all — that removes two sorted
    scalar gathers (+ their SMEM copies) from the prep stage.  The key is

        q = f32(cov4)^2 * (aux * 2^-4)

    which is BIT-IDENTICAL to _rank_tile's (f32(cov4)*0.25)^2 * aux: scaling
    by powers of two is exact in binary FP and commutes with rounding, so
    fl(fl((c*2^-2)^2)*aux) == fl(fl(c^2)*fl(aux*2^-4)).  5 i32 + 3 f32
    element passes replace the ~15 of the generic combine+_cov_exact chain —
    the measured kernel epilogue was ~60% of the step time.
    """
    ni = int(n)
    sa_i = ai.astype(jnp.int32).sum(axis=1, keepdims=True) + 128 * ni  # [BR, 1]
    sb4 = (4.0 * sb).astype(jnp.int32)  # [1, BM]
    aux16 = aux * 0.0625  # exact
    a_comb = 8 * abh + abl
    cov4 = ni * a_comb + (128 * ni - sa_i) * sb4
    cov4f = cov4.astype(jnp.float32)
    return (cov4f * cov4f) * aux16


def _search_kernel(
    *refs,  # tensor refs + outputs + scratch, see unpacking below
    bm: int,
    criterion: str,
    so_mode: str,
    s_max: float,
    inv_norm: float,
    k: int,
    use_classes: bool,
    use_int8: bool,
    m_valid: int,
    threshold: float,
    t_n: int,
):
    # f32 mode:  a[BR,K]f32, sa, sa2, c[BM,K]f32, sb, aux, rcls, ccls
    # int8 mode: ai[BR,K]i8, sa, sa2, ch[BM,K]i8, cl[BM,K]i8, sb, aux, rcls, ccls
    # aux = inv_var_b (mode 'ls') or SumB2 (other modes); see rank_mode.
    if use_int8:
        (ai_ref, sa_ref, sa2_ref, ch_ref, cl_ref, sb_ref, aux_ref,
         rcls_ref, ccls_ref, q_out, idx_out, best_q, best_idx, frozen) = refs
    else:
        (a_ref, sa_ref, sa2_ref, c_ref, sb_ref, aux_ref,
         rcls_ref, ccls_ref, q_out, idx_out, best_q, best_idx, frozen) = refs

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_q[:] = jnp.full_like(best_q, -_BIG)
        best_idx[:] = jnp.zeros_like(best_idx)
        frozen[:] = jnp.zeros_like(frozen)

    sa = sa_ref[:]  # [BR, 1]
    sa2 = sa2_ref[:]  # [BR, 1]
    sb = sb_ref[:]  # [1, BM]
    n = float(k)

    ls_fast = _is_ls_fast(criterion, so_mode, s_max, use_int8, threshold)
    # MXU: SumAB for all pairs in this tile — exact either way.
    if ls_fast:
        abh, abl = _pair_ab_int8_raw(ai_ref[:], ch_ref[:], cl_ref[:])
        q = _rank_ls_int8(ai_ref[:], abh, abl, sb, aux_ref[:], n)
    elif use_int8:
        ab = _pair_ab_int8(ai_ref[:], ch_ref[:], cl_ref[:], sb)
        q = _rank_tile(ab, sa, sa2, sb, aux_ref[:], criterion=criterion,
                       so_mode=so_mode, s_max=s_max, inv_norm=inv_norm, n=n)
    else:
        ab = _pair_ab_f32(a_ref[:], c_ref[:])
        q = _rank_tile(ab, sa, sa2, sb, aux_ref[:], criterion=criterion,
                       so_mode=so_mode, s_max=s_max, inv_norm=inv_norm, n=n)

    if use_classes:
        mask = rcls_ref[:] == ccls_ref[:]  # [BR, BM] via broadcast
        q = jnp.where(mask, q, -_BIG)
    elif not ls_fast:
        # mask padded codebook columns (static tail; their zero vectors would
        # otherwise produce spurious keys).  With classes the padded tail has
        # a non-matching class; on the ls_fast path zero-padded columns give
        # exactly q = 0 >= no real key and sit after every real column, so
        # first-occurrence ties keep them from ever winning.
        col = j * bm + jax.lax.broadcasted_iota(jnp.int32, (1, bm), 1)
        q = jnp.where(col < m_valid, q, -_BIG)

    if threshold > 0.0:
        q, any_hit = _apply_frontier(
            q, sa, sa2, criterion=criterion, so_mode=so_mode, s_max=s_max,
            inv_norm=inv_norm, n=n, threshold=threshold, t_n=t_n,
        )

    # tile-local argmax with EXPLICIT first-occurrence tie-break (= lowest
    # column index = the reference's argmin-dist tie rule; q is strictly
    # decreasing in dist).  Mosaic's compiled argmax does not guarantee
    # first-occurrence on ties, so take min-index-of-max instead.
    tile_q = jnp.max(q, axis=1, keepdims=True)  # [BR, 1]
    ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    tile_arg = jnp.min(jnp.where(q == tile_q, ids, jnp.int32(2**31 - 1)),
                       axis=1, keepdims=True)  # [BR, 1]
    tile_arg = tile_arg + j * bm

    improved = tile_q > best_q[:]
    if threshold > 0.0:
        # rows past their early-accept frontier stop improving (the frontier
        # tile itself still updates: freeze applies from the NEXT tile on)
        improved = improved & (frozen[:] == 0)
        frozen[:] = jnp.where(any_hit, jnp.int32(1), frozen[:])
    best_idx[:] = jnp.where(improved, tile_arg, best_idx[:])
    best_q[:] = jnp.where(improved, tile_q, best_q[:])

    @pl.when(j == nj - 1)
    def _finalize():
        q_out[:] = best_q[:]
        idx_out[:] = best_idx[:]


def rank_mode(criterion: str, so_mode: str, s_max: float) -> str:
    """Which ranking epilogue a (criterion, so_mode, s_max) combo uses.

    'raw'     — key q = 2*SumAB - SumB2 (maximize); dist = (SumA2 - q)*inv_norm.
    'ls'      — key q = cov^2 * inv_var_b (maximize);
                dist = max(var_a - q, 0) * (inv_norm / n).
                Requires the per-column reciprocal inv_var_b as the aux input.
    'general' — full residual with the mode's (s, o); key q = -dist.

    The fast keys drop every per-pair division/select and the rank-1
    var_a/var_b terms from the [BR, BM] hot loop: ranking by q is strictly
    monotone in dist per row, so argmax-q with first-occurrence ties equals
    the reference argmin-dist tie-break.  The jnp oracle ranks with the same
    expressions (same f32 rounding), keeping kernel/oracle winners identical.
    """
    if criterion == "raw":
        return "raw"
    if so_mode == "ls" and s_max <= 0.0:
        return "ls"
    return "general"


def inv_var_b(sb, sb2, n: float):
    """Per-column guarded reciprocal 1/var_b with the oracle's zero-guard
    semantics (s = 0 when |var_b| < 1e-5; solve_so in encode/matcher.py).

    For K <= INT8_MAX_K the difference is computed in exact i32 (codebook
    samples are multiples of 0.25, so 16*var_b = n*(16*SumB2) - (4*SumB)^2
    with every term < 2^31): the only rounding is the final i32 -> f32 cast
    — deterministic and fusion-proof, so any code path that rebuilds the
    same integers (e.g. classed_prep deriving sorted-order sums from the
    resident int8 operands) reproduces the value bit-for-bit.  The guard
    |var_b| < 1e-5 collapses to var16 == 0 because var_b is a multiple of
    1/16.
    """
    if n <= INT8_MAX_K:
        sb4 = (4.0 * sb).astype(jnp.int32)
        sb2_16 = (16.0 * sb2).astype(jnp.int32)
        var16 = int(n) * sb2_16 - sb4 * sb4  # exact i32
        var_b = var16.astype(jnp.float32) * 0.0625
        return jnp.where(var16 == 0, 0.0,
                         1.0 / jnp.where(var16 == 0, 1.0, var_b))
    var_b = n * sb2 - sb * sb
    return jnp.where(jnp.abs(var_b) < 1e-5, 0.0,
                     1.0 / jnp.where(var_b == 0.0, 1.0, var_b))


def _cov_exact(ab, sa, sb, n: float):
    """cov = n*SumAB - SumA*SumB with NO catastrophic cancellation noise.

    cov is the difference of two ~n*K*255^2 quantities; in f32 the result
    (often ~1e2) inherits the operands' rounding, and worse, it varies with
    the compiler's FMA-contraction choices — enough to flip argmax winners
    between separately compiled programs (kernel vs oracle).  All terms are
    multiples of 0.25, so for K <= INT8_MAX_K the scaled difference fits i32
    exactly; the single deterministic rounding is the final i32->f32 cast.
    """
    if n <= INT8_MAX_K:
        ab4 = (4.0 * ab).astype(jnp.int32)  # exact: 4*SumAB <= 2^24
        sa_i = sa.astype(jnp.int32)
        sb4 = (4.0 * sb).astype(jnp.int32)
        cov4 = int(n) * ab4 - sa_i * sb4  # exact i32
        return cov4.astype(jnp.float32) * 0.25
    return n * ab - sa * sb


def _rank_tile(ab, sa, sa2, sb, aux, *, criterion, so_mode, s_max, inv_norm, n):
    """Shared VPU epilogue: the MAXIMIZED ranking key q for a [BR, BM] tile.

    ``aux`` is inv_var_b for mode 'ls', SumB2 otherwise (see rank_mode).
    """
    mode = rank_mode(criterion, so_mode, s_max)
    if mode == "raw":
        return 2.0 * ab - aux  # aux = sb2
    cov = _cov_exact(ab, sa, sb, n)
    if mode == "ls":
        return (cov * cov) * aux  # aux = inv_var_b
    # general: full residual, q = -dist (aux = sb2)
    sb2 = aux
    var_b = n * sb2 - sb * sb
    if so_mode == "ls":
        var_a = n * sa2 - sa * sa
        s = jnp.where(jnp.abs(var_b) < 1e-5, 0.0,
                      cov / jnp.where(var_b == 0.0, 1.0, var_b))
        if s_max > 0.0:
            s = jnp.clip(s, -s_max, s_max)
        e = (var_a - 2.0 * s * cov + (s * s) * var_b) * (1.0 / n)
        return -(jnp.maximum(e, 0.0) * inv_norm)
    den = n * sa2 - (sa - 1.0) * sa
    s = jnp.where(jnp.abs(den) < 1e-5, 0.0,
                  cov / jnp.where(den == 0.0, 1.0, den))
    if s_max > 0.0:
        s = jnp.clip(s, -s_max, s_max)
    o = (sb - s * sa) * (1.0 / n)
    e = (sa2 + (s * s) * sb2 + n * o * o + 2.0 * s * o * sb
         - 2.0 * s * ab - 2.0 * o * sa)
    return -(jnp.maximum(e, 0.0) * inv_norm)


def rank_to_dist(q, sa2, sa, *, criterion, so_mode, s_max, inv_norm, n: float):
    """Convert ranking keys back to distances (the wrappers' epilogue).

    Vectorized over any shape; sa/sa2 broadcast against q.  Entries with
    q <= -_BIG/2 (masked) map to +_BIG.
    """
    mode = rank_mode(criterion, so_mode, s_max)
    if mode == "raw":
        dist = (sa2 - q) * inv_norm
    elif mode == "ls":
        if n <= INT8_MAX_K:  # exact var_a (integer terms; see _cov_exact)
            sa_i = sa.astype(jnp.int32)
            var_a = (int(n) * sa2.astype(jnp.int32)
                     - sa_i * sa_i).astype(jnp.float32)
        else:
            var_a = n * sa2 - sa * sa
        dist = jnp.maximum(var_a - q, 0.0) * (inv_norm * (1.0 / n))
    else:
        dist = -q
    return jnp.where(q <= -_BIG * 0.5, _BIG, dist)


def _classed_kernel(
    # scalar prefetch (4 refs), then tensors:
    # f32 mode:  a[BR,K]f32, sa, sa2, c[BM,K]f32, sb, sb2
    # int8 mode: ai[BR,K]i8, sa, sa2, ch[BM,K]i8, cl[BM,K]i8, sb, sb2
    *refs,
    bm: int,
    criterion: str,
    so_mode: str,
    s_max: float,
    inv_norm: float,
    k: int,
    use_int8: bool,
    threshold: float,
    t_n: int,
):
    _ls_fast = _is_ls_fast(criterion, so_mode, s_max, use_int8, threshold)
    if _ls_fast:
        # per-row sums are derived in-kernel from the int8 tiles
        (tile_class_ref, col_tile_start_ref, col_tile_count_ref, col_end_ref,
         ai_ref, ch_ref, cl_ref, sb_ref, aux_ref,
         q_out, idx_out, best_q, best_idx, frozen) = refs
    elif use_int8:
        (tile_class_ref, col_tile_start_ref, col_tile_count_ref, col_end_ref,
         ai_ref, sa_ref, sa2_ref, ch_ref, cl_ref, sb_ref, aux_ref,
         q_out, idx_out, best_q, best_idx, frozen) = refs
    else:
        (tile_class_ref, col_tile_start_ref, col_tile_count_ref, col_end_ref,
         a_ref, sa_ref, sa2_ref, c_ref, sb_ref, aux_ref,
         q_out, idx_out, best_q, best_idx, frozen) = refs

    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_q[:] = jnp.full_like(best_q, -_BIG)
        best_idx[:] = jnp.zeros_like(best_idx)
        frozen[:] = jnp.zeros_like(frozen)

    cls = tile_class_ref[i]
    active = j < col_tile_count_ref[cls]

    @pl.when(active)
    def _compute():
        ls_fast = _is_ls_fast(criterion, so_mode, s_max, use_int8, threshold)
        if ls_fast:
            abh, abl = _pair_ab_int8_raw(ai_ref[:], ch_ref[:], cl_ref[:])
            q = _rank_ls_int8(ai_ref[:], abh, abl, sb_ref[:], aux_ref[:],
                              float(k))
        elif use_int8:
            ab = _pair_ab_int8(ai_ref[:], ch_ref[:], cl_ref[:], sb_ref[:])
            q = _rank_tile(
                ab, sa_ref[:], sa2_ref[:], sb_ref[:], aux_ref[:],
                criterion=criterion, so_mode=so_mode, s_max=s_max,
                inv_norm=inv_norm, n=float(k),
            )
        else:
            ab = _pair_ab_f32(a_ref[:], c_ref[:])
            q = _rank_tile(
                ab, sa_ref[:], sa2_ref[:], sb_ref[:], aux_ref[:],
                criterion=criterion, so_mode=so_mode, s_max=s_max,
                inv_norm=inv_norm, n=float(k),
            )
        col0 = (col_tile_start_ref[cls] + j) * bm
        if ls_fast:
            # zero-padded slots in the class segment's last tile give exactly
            # q = 0 and sit after every real column: first-occurrence ties
            # keep them from winning, no explicit mask needed
            col = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, bm), 1)
        else:
            col = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, bm), 1)
            q = jnp.where(col < col_end_ref[cls], q, -_BIG)

        if threshold > 0.0:
            q2, any_hit = _apply_frontier(
                q, sa_ref[:], sa2_ref[:], criterion=criterion,
                so_mode=so_mode, s_max=s_max, inv_norm=inv_norm,
                n=float(k), threshold=threshold, t_n=t_n,
            )
        else:
            q2 = q

        # explicit first-occurrence argmax; see _search_kernel
        tile_q = jnp.max(q2, axis=1, keepdims=True)
        ids = jax.lax.broadcasted_iota(jnp.int32, q2.shape, 1)
        tile_arg = jnp.min(jnp.where(q2 == tile_q, ids, jnp.int32(2**31 - 1)),
                           axis=1, keepdims=True) + col0
        improved = tile_q > best_q[:]
        if threshold > 0.0:
            improved = improved & (frozen[:] == 0)
            frozen[:] = jnp.where(any_hit, jnp.int32(1), frozen[:])
        best_idx[:] = jnp.where(improved, tile_arg, best_idx[:])
        best_q[:] = jnp.where(improved, tile_q, best_q[:])

    @pl.when(j == nj - 1)
    def _finalize():
        # outputs are [NRT, BR] rows (one per range tile): a
        # [r_pad, 1] column output takes the (8, 128) tiled
        # layout's 128x lane padding in HBM — measured 8 GB of pure
        # padding per output at 16384^2, which alone exceeded the
        # chip.  The sublane->lane transpose runs once per row
        # tile, off the per-step hot path.
        q_out[:] = best_q[:].reshape(1, 1, -1)
        idx_out[:] = best_idx[:].reshape(1, 1, -1)


def _int8_operands(ranges_f32, cb_f32):
    """(ai, ch, cl) int8 operands for _pair_ab_int8, derived from the exact
    f32 arrays (range pixels: 8-bit ints; codebook: 0.25-quantized)."""
    ai = (ranges_f32.astype(jnp.int32) - 128).astype(jnp.int8)
    b4 = jnp.round(cb_f32 * 4.0).astype(jnp.int32)
    return ai, (b4 >> 3).astype(jnp.int8), (b4 & 7).astype(jnp.int8)


# Max active (range-tile, col-tile) pairs in the pair-list kernel: one packed
# i32 per pair in SMEM via scalar prefetch (768KB measured safe on v5e).
PAIR_CAP = 196608

_CT_BITS = 12  # col-tile index field (m_pad/block_m < 4096: covers 8K-image
# defaults at BM=4096; rt keeps 32-2-12=18 bits, ample for range tiles)
_RT_SHIFT = 2 + _CT_BITS


def _pack_pairs(rt, ct, first, compute):
    return ((rt << _RT_SHIFT) | (ct << 2)
            | (first.astype(jnp.int32) << 1) | compute.astype(jnp.int32))


def _pairs_kernel(
    pair_ref,  # [P_cap] i32 packed (rt | ct | first | compute)
    tile_class_ref,  # [NRT] i32
    col_end_ref,  # [NC] i32
    *refs,  # tensors (f32 or int8 layout, as in _classed_kernel) + outputs
    bm: int,
    criterion: str,
    so_mode: str,
    s_max: float,
    inv_norm: float,
    k: int,
    use_int8: bool,
    threshold: float,
    t_n: int,
):
    """Active-pair-list search: 1-D DYNAMIC grid over exactly the pairs the
    classifier keeps — zero skipped grid steps (the 2-D classed kernel pays
    ~2.6us pipeline bookkeeping for every predicated-off step; at 4K that is
    ~40% of the kernel).  The best-(q, idx) accumulators live directly in the
    output blocks, which stay VMEM-resident while consecutive pairs share the
    same range tile (pairs are sorted by range tile)."""
    _ls_fast = _is_ls_fast(criterion, so_mode, s_max, use_int8, threshold)
    if _ls_fast:
        (ai_ref, ch_ref, cl_ref, sb_ref, aux_ref, q_out, idx_out,
         frozen) = refs
    elif use_int8:
        (ai_ref, sa_ref, sa2_ref, ch_ref, cl_ref, sb_ref, aux_ref,
         q_out, idx_out, frozen) = refs
    else:
        (a_ref, sa_ref, sa2_ref, c_ref, sb_ref, aux_ref,
         q_out, idx_out, frozen) = refs

    p = pl.program_id(0)
    packed = pair_ref[p]
    first = (packed >> 1) & 1
    compute = packed & 1
    ct = (packed >> 2) & ((1 << _CT_BITS) - 1)
    rt = packed >> _RT_SHIFT

    @pl.when(first == 1)
    def _init():
        q_out[:] = jnp.full_like(q_out, -_BIG)
        idx_out[:] = jnp.zeros_like(idx_out)
        frozen[:] = jnp.zeros_like(frozen)

    @pl.when(compute == 1)
    def _compute():
        ls_fast = _is_ls_fast(criterion, so_mode, s_max, use_int8, threshold)
        if ls_fast:
            abh, abl = _pair_ab_int8_raw(ai_ref[:], ch_ref[:], cl_ref[:])
            q = _rank_ls_int8(ai_ref[:], abh, abl, sb_ref[:], aux_ref[:],
                              float(k))
        elif use_int8:
            ab = _pair_ab_int8(ai_ref[:], ch_ref[:], cl_ref[:], sb_ref[:])
            q = _rank_tile(
                ab, sa_ref[:], sa2_ref[:], sb_ref[:], aux_ref[:],
                criterion=criterion, so_mode=so_mode, s_max=s_max,
                inv_norm=inv_norm, n=float(k),
            )
        else:
            ab = _pair_ab_f32(a_ref[:], c_ref[:])
            q = _rank_tile(
                ab, sa_ref[:], sa2_ref[:], sb_ref[:], aux_ref[:],
                criterion=criterion, so_mode=so_mode, s_max=s_max,
                inv_norm=inv_norm, n=float(k),
            )
        col0 = ct * bm
        if not ls_fast:
            # ls_fast: zero-padded segment slots give q = 0 after every real
            # column; first-occurrence ties exclude them without a mask
            col = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, bm), 1)
            q = jnp.where(col < col_end_ref[tile_class_ref[rt]], q, -_BIG)

        if threshold > 0.0:
            q, any_hit = _apply_frontier(
                q, sa_ref[:], sa2_ref[:], criterion=criterion,
                so_mode=so_mode, s_max=s_max, inv_norm=inv_norm,
                n=float(k), threshold=threshold, t_n=t_n,
            )

        # explicit first-occurrence argmax; see _search_kernel
        tile_q = jnp.max(q, axis=1, keepdims=True)
        ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        tile_arg = jnp.min(jnp.where(q == tile_q, ids, jnp.int32(2**31 - 1)),
                           axis=1, keepdims=True) + col0
        improved = tile_q > q_out[:]
        if threshold > 0.0:
            improved = improved & (frozen[:] == 0)
            frozen[:] = jnp.where(any_hit, jnp.int32(1), frozen[:])
        idx_out[:] = jnp.where(improved, tile_arg, idx_out[:])
        q_out[:] = jnp.where(improved, tile_q, q_out[:])


@functools.partial(
    jax.jit,
    static_argnames=("criterion", "so_mode", "s_max", "inv_norm",
                     "block_r", "block_m", "p_cap", "use_int8", "interpret",
                     "threshold", "t_n"),
)
def fused_search_pairs(
    ranges_sorted,  # [R_pad, K] f32 — class-sorted, tile-aligned
    sum_a_sorted,  # [R_pad]
    sum_a2_sorted,  # [R_pad]
    cb_sorted,  # [M_pad, K] f32 — class-sorted, tile-aligned columns
    sb_sorted,  # [M_pad]
    aux_sorted,  # [M_pad] — inv_var_b (mode 'ls') or SumB2
    pairs,  # [p_cap] i32 packed pair list (valid prefix of length n_pairs)
    n_pairs,  # i32 scalar — DYNAMIC grid length
    tile_class,  # [NRT] i32
    col_end,  # [NC] i32
    *,
    criterion: str,
    so_mode: str,
    s_max: float,
    inv_norm: float,
    block_r: int,
    block_m: int,
    p_cap: int,
    use_int8: bool = False,
    int8_ops=None,  # optional preconverted (ai, ch, cl) int8 arrays
    interpret: bool = False,
    threshold: float = 0.0,
    t_n: int = 4,
):
    """Pair-list variant of fused_search_classed (same results; see
    _pairs_kernel).  The caller guarantees n_pairs <= p_cap and that every
    range tile contributes at least one (possibly compute=0) pair so its
    output block is initialized.

    ``int8_ops`` lets the caller supply the int8 operands already in sorted
    layout (converted BEFORE the layout gathers — 4x less gather traffic);
    ``ranges_sorted``/``cb_sorted`` may then be None.
    """
    if int8_ops is not None:
        assert use_int8
        r_pad, k = int8_ops[0].shape
    else:
        r_pad, k = ranges_sorted.shape
    assert r_pad % block_r == 0
    assert not (use_int8 and k > INT8_MAX_K)
    assert threshold <= 0.0 or block_m % t_n == 0, (block_m, t_n)

    kernel = functools.partial(
        _pairs_kernel,
        bm=block_m,
        criterion=criterion,
        so_mode=so_mode,
        s_max=s_max,
        inv_norm=inv_norm,
        k=k,
        use_int8=use_int8,
        threshold=threshold,
        t_n=t_n,
    )

    def _rt(p, pairs, *_):
        return pairs[p] >> _RT_SHIFT

    def _ct(p, pairs, *_):
        return (pairs[p] >> 2) & ((1 << _CT_BITS) - 1)

    row_spec = pl.BlockSpec((block_r, k), lambda p, *s: (_rt(p, *s), 0))
    rsum_spec = pl.BlockSpec((block_r, 1), lambda p, *s: (_rt(p, *s), 0))
    col_spec = pl.BlockSpec((block_m, k), lambda p, *s: (_ct(p, *s), 0))
    csum_spec = pl.BlockSpec((1, block_m), lambda p, *s: (0, _ct(p, *s)))

    ls_fast = _is_ls_fast(criterion, so_mode, s_max, use_int8, threshold)
    if use_int8:
        if int8_ops is not None:
            ai, ch, cl = int8_ops
        else:
            ai, ch, cl = _int8_operands(ranges_sorted, cb_sorted)
        if ls_fast:
            # per-row sums derived in-kernel (see _rank_ls_int8): no sum
            # inputs at all
            tensor_args = (ai, ch, cl,
                           sb_sorted.reshape(1, -1),
                           aux_sorted.reshape(1, -1))
            in_specs = [row_spec, col_spec, col_spec, csum_spec, csum_spec]
        else:
            tensor_args = (ai,
                           sum_a_sorted.reshape(-1, 1),
                           sum_a2_sorted.reshape(-1, 1),
                           ch, cl,
                           sb_sorted.reshape(1, -1),
                           aux_sorted.reshape(1, -1))
            in_specs = [row_spec, rsum_spec, rsum_spec,
                        col_spec, col_spec, csum_spec, csum_spec]
    else:
        tensor_args = (ranges_sorted,
                       sum_a_sorted.reshape(-1, 1),
                       sum_a2_sorted.reshape(-1, 1),
                       cb_sorted,
                       sb_sorted.reshape(1, -1),
                       aux_sorted.reshape(1, -1))
        in_specs = [row_spec, rsum_spec, rsum_spec,
                    col_spec, csum_spec, csum_spec]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pairs,),  # dynamic: exactly the active pairs, no tail
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_r, 1), lambda p, *s: (_rt(p, *s), 0)),
            pl.BlockSpec((block_r, 1), lambda p, *s: (_rt(p, *s), 0)),
        ],
        scratch_shapes=[pltpu.VMEM((block_r, 1), jnp.int32)],  # frozen flags
    )

    vmem_bytes = min(
        96 * 1024 * 1024,
        (6 * block_r * block_m + 4 * block_m * k + 2 * block_r * k) * 4
        + 4 * 1024 * 1024,
    )
    q, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(
        pairs.astype(jnp.int32),
        tile_class.astype(jnp.int32),
        col_end.astype(jnp.int32),
        *tensor_args,
    )
    if sum_a_sorted is None:
        # ls_fast sorted path: the caller converts q -> dist AFTER mapping
        # back to original range order (rank_to_dist is elementwise, so the
        # values are identical and the sorted per-row sums never exist)
        dist = None
    else:
        dist = rank_to_dist(
            q.reshape(-1), sum_a2_sorted, sum_a_sorted,
            criterion=criterion, so_mode=so_mode, s_max=s_max,
            inv_norm=inv_norm, n=float(k),
        )
    return dist, idx.reshape(-1), q.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("criterion", "so_mode", "s_max", "inv_norm",
                     "block_r", "block_m", "use_int8", "interpret",
                     "threshold", "t_n"),
)
def fused_search_classed(
    ranges_sorted,  # [R_pad, K] f32 — class-sorted, tile-aligned
    sum_a_sorted,  # [R_pad]
    sum_a2_sorted,  # [R_pad]
    cb_sorted,  # [M_pad, K] f32 — class-sorted, tile-aligned columns
    sb_sorted,  # [M_pad]
    aux_sorted,  # [M_pad] — inv_var_b (mode 'ls') or SumB2; see rank_mode
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
    use_int8: bool = False,
    int8_ops=None,  # optional preconverted (ai, ch, cl) int8 arrays
    interpret: bool = False,
    threshold: float = 0.0,
    t_n: int = 4,
):
    """Class-blocked search: each range tile only visits its class's column
    segment.  The grid is sized for the worst case but off-class tiles are
    predicated away (`pl.when`), so the matmul/epilogue cost is proportional
    to the classifier's surviving pair count (~1/6 with the 6-class
    brightness classifier) instead of the full cross product.

    Returns (best_dist [R_pad], best_idx [R_pad] in sorted-column units).
    """
    if int8_ops is not None:
        assert use_int8
        r_pad, k = int8_ops[0].shape
        m_pad = int8_ops[1].shape[0]
    else:
        r_pad, k = ranges_sorted.shape
        m_pad = cb_sorted.shape[0]
    assert r_pad % block_r == 0 and m_pad % block_m == 0
    assert not (use_int8 and k > INT8_MAX_K)
    assert threshold <= 0.0 or block_m % t_n == 0, (block_m, t_n)
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
        use_int8=use_int8,
        threshold=threshold,
        t_n=t_n,
    )

    def col_index(i, j, tile_class, col_tile_start, col_tile_count, col_end):
        cls = tile_class[i]
        # clamp skipped iterations onto the class's last real tile so the
        # pipeline re-fetches the same block (no extra DMA) instead of
        # streaming unused codebook tiles
        jj = jnp.minimum(j, jnp.maximum(col_tile_count[cls] - 1, 0))
        return col_tile_start[cls] + jj

    row_spec = pl.BlockSpec((block_r, k), lambda i, j, *s: (i, 0))
    rsum_spec = pl.BlockSpec((block_r, 1), lambda i, j, *s: (i, 0))
    col_spec = pl.BlockSpec((block_m, k),
                            lambda i, j, *s: (col_index(i, j, *s), 0))
    csum_spec = pl.BlockSpec((1, block_m),
                             lambda i, j, *s: (0, col_index(i, j, *s)))

    ls_fast = _is_ls_fast(criterion, so_mode, s_max, use_int8, threshold)
    if use_int8:
        if int8_ops is not None:
            ai, ch, cl = int8_ops
        else:
            ai, ch, cl = _int8_operands(ranges_sorted, cb_sorted)
        if ls_fast:
            # per-row sums derived in-kernel (see _rank_ls_int8): no sum
            # inputs at all
            tensor_args = (ai, ch, cl,
                           sb_sorted.reshape(1, -1),
                           aux_sorted.reshape(1, -1))
            in_specs = [row_spec, col_spec, col_spec, csum_spec, csum_spec]
        else:
            tensor_args = (ai,
                           sum_a_sorted.reshape(-1, 1),
                           sum_a2_sorted.reshape(-1, 1),
                           ch, cl,
                           sb_sorted.reshape(1, -1),
                           aux_sorted.reshape(1, -1))
            in_specs = [row_spec, rsum_spec, rsum_spec,
                        col_spec, col_spec, csum_spec, csum_spec]
    else:
        tensor_args = (ranges_sorted,
                       sum_a_sorted.reshape(-1, 1),
                       sum_a2_sorted.reshape(-1, 1),
                       cb_sorted,
                       sb_sorted.reshape(1, -1),
                       aux_sorted.reshape(1, -1))
        in_specs = [row_spec, rsum_spec, rsum_spec,
                    col_spec, csum_spec, csum_spec]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_r), lambda i, j, *s: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_r), lambda i, j, *s: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.int32),
            pltpu.VMEM((block_r, 1), jnp.int32),  # frozen flags
        ],
    )

    vmem_bytes = min(
        96 * 1024 * 1024,
        (6 * block_r * block_m + 4 * block_m * k + 2 * block_r * k) * 4
        + 4 * 1024 * 1024,
    )
    q, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nrt, 1, block_r), jnp.float32),
            jax.ShapeDtypeStruct((nrt, 1, block_r), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(
        tile_class.astype(jnp.int32),
        col_tile_start.astype(jnp.int32),
        col_tile_count.astype(jnp.int32),
        col_end.astype(jnp.int32),
        *tensor_args,
    )
    if sum_a_sorted is None:
        # ls_fast sorted path: the caller converts q -> dist AFTER mapping
        # back to original range order (rank_to_dist is elementwise, so the
        # values are identical and the sorted per-row sums never exist)
        dist = None
    else:
        dist = rank_to_dist(
            q.reshape(-1), sum_a2_sorted, sum_a_sorted,
            criterion=criterion, so_mode=so_mode, s_max=s_max,
            inv_norm=inv_norm, n=float(k),
        )
    return dist, idx.reshape(-1), q.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("criterion", "so_mode", "s_max", "inv_norm", "use_classes",
                     "m_valid", "block_r", "block_m", "use_int8", "interpret",
                     "threshold", "t_n"),
)
def fused_search(
    ranges,  # [R, K] f32
    sum_a,  # [R] f32
    sum_a2,  # [R] f32
    codebook,  # [M, K] f32, columns in search order
    sum_b,  # [M] f32
    aux_b,  # [M] f32 — inv_var_b (mode 'ls') or SumB2; see rank_mode
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
    use_int8: bool = False,
    interpret: bool = False,
    threshold: float = 0.0,
    t_n: int = 4,
):
    """Returns (best_dist [R] f32, best_idx [R] i32 into the M axis).

    R must be a multiple of block_r and M a multiple of block_m (the encoder
    zero-pads; ``m_valid`` marks the real column count so the padded tail is
    masked inside the kernel).
    """
    r, k = ranges.shape
    m = codebook.shape[0]
    assert r % block_r == 0 and m % block_m == 0, (r, m, block_r, block_m)
    assert not (use_int8 and k > INT8_MAX_K)
    assert threshold <= 0.0 or block_m % t_n == 0, (block_m, t_n)
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
        use_int8=use_int8,
        m_valid=m if m_valid is None else m_valid,
        threshold=threshold,
        t_n=t_n,
    )

    row_spec = pl.BlockSpec((block_r, k), lambda i, j: (i, 0))
    rsum_spec = pl.BlockSpec((block_r, 1), lambda i, j: (i, 0))
    col_spec = pl.BlockSpec((block_m, k), lambda i, j: (j, 0))
    csum_spec = pl.BlockSpec((1, block_m), lambda i, j: (0, j))
    aux = aux_b

    if use_int8:
        ai, ch, cl = _int8_operands(ranges, codebook)
        tensor_args = (ai, sum_a.reshape(-1, 1), sum_a2.reshape(-1, 1),
                       ch, cl, sum_b.reshape(1, -1), aux.reshape(1, -1))
        in_specs = [row_spec, rsum_spec, rsum_spec,
                    col_spec, col_spec, csum_spec, csum_spec]
    else:
        tensor_args = (ranges, sum_a.reshape(-1, 1), sum_a2.reshape(-1, 1),
                       codebook, sum_b.reshape(1, -1), aux.reshape(1, -1))
        in_specs = [row_spec, rsum_spec, rsum_spec,
                    col_spec, csum_spec, csum_spec]
    in_specs += [rsum_spec, csum_spec]  # rcls, ccls

    # VMEM budget: the epilogue keeps a handful of [block_r, block_m] f32
    # arrays live; give the compiler explicit headroom so large grids don't
    # trip the default 16M scoped limit.
    vmem_bytes = min(
        96 * 1024 * 1024,
        (6 * block_r * block_m + 4 * block_m * k + 2 * block_r * k) * 4
        + 4 * 1024 * 1024,
    )
    q, idx = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        in_specs=in_specs,
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
            pltpu.VMEM((block_r, 1), jnp.int32),  # frozen flags
        ],
        interpret=interpret,
    )(
        *tensor_args,
        range_classes.reshape(-1, 1).astype(jnp.int32),
        col_classes.reshape(1, -1).astype(jnp.int32),
    )
    dist = rank_to_dist(
        q.reshape(-1), sum_a2, sum_a,
        criterion=criterion, so_mode=so_mode, s_max=s_max,
        inv_norm=inv_norm, n=float(k),
    )
    return dist, idx.reshape(-1), q.reshape(-1)
