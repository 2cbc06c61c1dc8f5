"""Kernel-step microbench: isolate matmul / epilogue / argmax costs.

Mimics the production pair-list kernel (1-D dynamic grid, scalar-prefetch
block maps) with ablated step bodies; per-step cost comes from the DELTA
between two pair-list lengths (cancels the ~25 ms tunnel dispatch floor).

  full      — the production ls_fast step (matmul + int epilogue + 2-pass argmax)
  noargpass — tile_arg = j (skip the eq+where+min passes; savings ceiling)
  packed    — single-pass argmax: bitcast(q)&~4095 | (4095-lane), one max
              (NOT exact: q mantissa truncated; measurement only)
  matmul    — matmuls + max only (epilogue savings ceiling)
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fractencode_tpu.ops.matcher_pallas import (
    _BIG, _pack_pairs, _pair_ab_int8_raw, _rank_ls_int8,
)

BR, BM, K = 512, 4096, 16
NI, NJ = 8, 64
R_PAD, M_PAD = NI * BR, NJ * BM
P_CAP = NI * NJ * 8


def kernel(pair_ref, ai_ref, ch_ref, cl_ref, sb_ref, aux_ref,
           q_out, idx_out, *, variant):
    p = pl.program_id(0)
    packed = pair_ref[p]
    first = (packed >> 1) & 1
    ct = (packed >> 2) & 1023

    @pl.when(first == 1)
    def _init():
        q_out[:] = jnp.full_like(q_out, -_BIG)
        idx_out[:] = jnp.zeros_like(idx_out)

    abh, abl = _pair_ab_int8_raw(ai_ref[:], ch_ref[:], cl_ref[:])
    if variant == "matmul":
        q = (8 * abh + abl).astype(jnp.float32)
    else:
        q = _rank_ls_int8(ai_ref[:], abh, abl, sb_ref[:], aux_ref[:], float(K))
    col0 = ct * BM
    if variant == "packed":
        ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        key = (jax.lax.bitcast_convert_type(q, jnp.int32) & ~4095) | (4095 - ids)
        kmax = jnp.max(key, axis=1, keepdims=True)
        tile_q = jax.lax.bitcast_convert_type(kmax & ~4095, jnp.float32)
        tile_arg = (4095 - (kmax & 4095)) + col0
    elif variant in ("noargpass", "matmul"):
        tile_q = jnp.max(q, axis=1, keepdims=True)
        tile_arg = jnp.zeros_like(idx_out[:]) + col0
    else:
        tile_q = jnp.max(q, axis=1, keepdims=True)
        ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        tile_arg = jnp.min(jnp.where(q == tile_q, ids, jnp.int32(2**31 - 1)),
                           axis=1, keepdims=True) + col0
    improved = tile_q > q_out[:]
    idx_out[:] = jnp.where(improved, tile_arg, idx_out[:])
    q_out[:] = jnp.where(improved, tile_q, q_out[:])


@functools.partial(jax.jit, static_argnames=("variant",))
def run(pairs, n_pairs, ai, ch, cl, sb, aux, variant):
    def _rt(p, pairs):
        return pairs[p] >> 12

    def _ct(p, pairs):
        return (pairs[p] >> 2) & 1023

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((BR, K), lambda p, s: (_rt(p, s), 0)),
            pl.BlockSpec((BM, K), lambda p, s: (_ct(p, s), 0)),
            pl.BlockSpec((BM, K), lambda p, s: (_ct(p, s), 0)),
            pl.BlockSpec((1, BM), lambda p, s: (0, _ct(p, s))),
            pl.BlockSpec((1, BM), lambda p, s: (0, _ct(p, s))),
        ],
        out_specs=[
            pl.BlockSpec((BR, 1), lambda p, s: (_rt(p, s), 0)),
            pl.BlockSpec((BR, 1), lambda p, s: (_rt(p, s), 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R_PAD, 1), jnp.float32),
            jax.ShapeDtypeStruct((R_PAD, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                96 * 1024 * 1024,
                (6 * BR * BM + 4 * BM * K + 2 * BR * K) * 4 + 4 * 1024 * 1024,
            )),
    )(pairs, ai, ch, cl, sb, aux)


rng = np.random.default_rng(0)
ai = jnp.asarray(rng.integers(-128, 128, (R_PAD, K), np.int8))
ch = jnp.asarray(rng.integers(0, 128, (M_PAD, K), np.int8))
cl = jnp.asarray(rng.integers(0, 8, (M_PAD, K), np.int8))
sb = jnp.asarray(rng.random((1, M_PAD), np.float32) * 100)
aux = jnp.asarray(rng.random((1, M_PAD), np.float32))
jax.block_until_ready((ai, ch, cl, sb, aux))


def make_pairs(reps):
    rt = np.repeat(np.arange(NI, dtype=np.int32), NJ * reps)
    ct = np.tile(np.arange(NJ, dtype=np.int32), NI * reps)
    first = np.zeros(NI * NJ * reps, bool)
    first[:: NJ * reps] = True
    p = np.asarray(_pack_pairs(jnp.asarray(rt), jnp.asarray(ct),
                               jnp.asarray(first),
                               jnp.ones(NI * NJ * reps, jnp.int32)))
    return jnp.concatenate(
        [jnp.asarray(p), jnp.zeros((P_CAP - len(p),), jnp.int32)])


def timeit(variant, reps):
    pairs = make_pairs(reps)
    n = jnp.int32(NI * NJ * reps)
    q, idx = run(pairs, n, ai, ch, cl, sb, aux, variant)
    float(q.sum())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        q, idx = run(pairs, n, ai, ch, cl, sb, aux, variant)
        float(q.sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)


for variant in ["full", "noargpass", "packed", "matmul"]:
    t1 = timeit(variant, 1)
    t4 = timeit(variant, 4)
    us = (t4 - t1) / (NI * NJ * 3) * 1e6
    print(f"{variant:>10}: {us:6.2f} us/step")


# --- transposed-operand variant: ch/cl stored [K, M] so each block DMA
# moves (16-sublane x BM-lane) i8 tiles — 2x sublane padding instead of the
# 8x lane padding of [M, 16] blocks; rhs is already MXU-oriented.

def kernel_t(pair_ref, ai_ref, chT_ref, clT_ref, sb_ref, aux_ref,
             q_out, idx_out):
    p = pl.program_id(0)
    packed = pair_ref[p]
    first = (packed >> 1) & 1
    ct = (packed >> 2) & 1023

    @pl.when(first == 1)
    def _init():
        q_out[:] = jnp.full_like(q_out, -_BIG)
        idx_out[:] = jnp.zeros_like(idx_out)

    dn = (((1,), (0,)), ((), ()))
    abh = jax.lax.dot_general(ai_ref[:], chT_ref[:], dimension_numbers=dn,
                              preferred_element_type=jnp.int32)
    abl = jax.lax.dot_general(ai_ref[:], clT_ref[:], dimension_numbers=dn,
                              preferred_element_type=jnp.int32)
    q = _rank_ls_int8(ai_ref[:], abh, abl, sb_ref[:], aux_ref[:], float(K))
    col0 = ct * BM
    tile_q = jnp.max(q, axis=1, keepdims=True)
    ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    tile_arg = jnp.min(jnp.where(q == tile_q, ids, jnp.int32(2**31 - 1)),
                       axis=1, keepdims=True) + col0
    improved = tile_q > q_out[:]
    idx_out[:] = jnp.where(improved, tile_arg, idx_out[:])
    q_out[:] = jnp.where(improved, tile_q, q_out[:])


@jax.jit
def run_t(pairs, n_pairs, ai, chT, clT, sb, aux):
    def _rt(p, pairs):
        return pairs[p] >> 12

    def _ct(p, pairs):
        return (pairs[p] >> 2) & 1023

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((BR, K), lambda p, s: (_rt(p, s), 0)),
            pl.BlockSpec((K, BM), lambda p, s: (0, _ct(p, s))),
            pl.BlockSpec((K, BM), lambda p, s: (0, _ct(p, s))),
            pl.BlockSpec((1, BM), lambda p, s: (0, _ct(p, s))),
            pl.BlockSpec((1, BM), lambda p, s: (0, _ct(p, s))),
        ],
        out_specs=[
            pl.BlockSpec((BR, 1), lambda p, s: (_rt(p, s), 0)),
            pl.BlockSpec((BR, 1), lambda p, s: (_rt(p, s), 0)),
        ],
    )
    return pl.pallas_call(
        kernel_t,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R_PAD, 1), jnp.float32),
            jax.ShapeDtypeStruct((R_PAD, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                96 * 1024 * 1024,
                (6 * BR * BM + 4 * BM * K + 2 * BR * K) * 4 + 4 * 1024 * 1024,
            )),
    )(pairs, ai, chT, clT, sb, aux)


chT = jnp.asarray(np.asarray(ch).T.copy())
clT = jnp.asarray(np.asarray(cl).T.copy())
jax.block_until_ready((chT, clT))


def timeit_t(reps):
    pairs = make_pairs(reps)
    n = jnp.int32(NI * NJ * reps)
    q, idx = run_t(pairs, n, ai, chT, clT, sb, aux)
    float(q.sum())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        q, idx = run_t(pairs, n, ai, chT, clT, sb, aux)
        float(q.sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)


# correctness vs the row-major full variant
pairs1 = make_pairs(1)
qa, ia = run(pairs1, jnp.int32(NI * NJ), ai, ch, cl, sb, aux, "full")
qb, ib = run_t(pairs1, jnp.int32(NI * NJ), ai, chT, clT, sb, aux)
print("transposed bit-identical:",
      bool((np.asarray(qa) == np.asarray(qb)).all()
           and (np.asarray(ia) == np.asarray(ib)).all()))
t1, t4 = timeit_t(1), timeit_t(4)
print(f"transposed: {(t4-t1)/(NI*NJ*3)*1e6:6.2f} us/step")
