"""Finer delta profiling of classed_prep / classed_post internals on TPU.

Same truncated-variant technique as profile_deltas.py: each variant jits the
pipeline up to a cut point and checksums only what that cut needs — XLA
dead-code-eliminates everything downstream, so consecutive differences
isolate the cost of each op group without the per-dispatch tunnel floor.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fractencode_tpu import EncoderConfig
from fractencode_tpu.core.classify import classify_grid
from fractencode_tpu.core.grid import uniform_grid
from fractencode_tpu.encode.codebook import build_codebook, extract_ranges
from fractencode_tpu.encode.matcher import (
    _classed_statics, classed_kernel, classed_post, classed_prep,
)
from fractencode_tpu.image import load_gray

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

plane_np = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
if SIZE != 512:
    reps = -(-SIZE // 512)
    plane_np = np.tile(plane_np, (reps, reps))[:SIZE, :SIZE]
plane = jnp.asarray(plane_np)
jnp.add(plane, 0).block_until_ready()

cfg = EncoderConfig()
h, w = plane.shape
domain_grid = uniform_grid(w, h, cfg.source_size, cfg.domain_step)
range_grid = uniform_grid(w, h, cfg.target_size, cfg.target_size)
K = cfg.target_size ** 2


def _checksum(*arrays):
    acc = jnp.float32(0)
    for a in arrays:
        if a is None:
            continue
        acc = acc + jnp.sum(a.astype(jnp.float32))
    return acc


# prep cut points: which dict entries to force
PREP_CUTS = [
    ("rlayout", ["rpos"]),
    ("+collayout", ["rpos", "inv_col"]),
    ("+pairs", ["rpos", "inv_col", "pairs", "n_pairs", "tile_class"]),
    ("+sb/aux", ["rpos", "inv_col", "pairs", "n_pairs", "tile_class",
                 "sb_s", "aux_s"]),
    ("+ai_s", ["rpos", "inv_col", "pairs", "n_pairs", "tile_class",
               "sb_s", "aux_s", "ai_s"]),
    ("+ch/cl", ["rpos", "inv_col", "pairs", "n_pairs", "tile_class",
                "sb_s", "aux_s", "ai_s", "ch_s", "cl_s", "b4_cols"]),
]
POST_CUTS = ["kernel", "dist", "win", "sumab", "full"]


def base(p):
    pf = p.astype(jnp.float32)
    cb = build_codebook(pf, domain_grid, cfg.target_size, cfg.num_transforms)
    ranges = extract_ranges(pf, cfg.target_size)
    sum_a = ranges.sum(-1)
    sum_a2 = (ranges * ranges).sum(-1)
    dcls = classify_grid(p, domain_grid)
    rcls = classify_grid(p, range_grid)
    prep = classed_prep(ranges, sum_a, sum_a2, cb, rcls, dcls, cfg)
    return cb, ranges, sum_a, sum_a2, prep


def prep_variant(p, keys):
    _, _, _, _, prep = base(p)
    return _checksum(*(prep[k] for k in keys))


def post_variant(p, upto):
    from fractencode_tpu.ops.matcher_pallas import rank_to_dist

    cb, ranges, sum_a, sum_a2, prep = base(p)
    r, _ = ranges.shape
    d, t, _ = cb.values.shape
    m = d * t
    block_r, block_m, _, _, worst_pairs, p_cap, _ = _classed_statics(r, m, cfg)
    dist_s, idx_s, q_s = classed_kernel(prep, K, cfg.source_size ** 2, block_r,
                                        block_m, p_cap, worst_pairs, cfg, False)
    if upto == "kernel":
        return _checksum(q_s, idx_s)
    q = q_s[prep["rpos"]]
    dist = rank_to_dist(q, sum_a2, sum_a, criterion=cfg.criterion,
                        so_mode=cfg.so_mode, s_max=cfg.s_max,
                        inv_norm=1.0 / K, n=float(K))
    if upto == "dist":
        return _checksum(q, dist)
    win_sorted = idx_s[prep["rpos"]]
    m_pad = prep["inv_col"].shape[0]
    win_m = jnp.clip(prep["inv_col"][jnp.clip(win_sorted, 0, m_pad - 1)], 0, m - 1)
    if upto == "win":
        return _checksum(dist, win_m)
    b4_win = prep["b4_cols"][win_m].astype(jnp.int32)
    sum_ab = ((ranges.astype(jnp.int32) * b4_win).sum(-1).astype(jnp.float32)
              * 0.25)
    if upto == "sumab":
        return _checksum(dist, win_m, sum_ab)
    res = classed_post(dist_s, idx_s, q_s, prep["rpos"], prep["inv_col"],
                       ranges, sum_a, sum_a2, cb, cfg, b4_cols=prep["b4_cols"])
    return _checksum(res.domain_idx, res.s, res.o, res.distance)


def run(name, fn):
    out = fn(plane)
    float(out)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(fn(plane))
        ts.append(time.perf_counter() - t0)
    return min(ts)


prev = 0.0
print("== prep internals ==")
for name, keys in PREP_CUTS:
    cum = run(name, jax.jit(lambda p, keys=tuple(keys): prep_variant(p, keys)))
    print(f"{name:>12}: cumulative {cum*1e3:8.2f} ms   delta {(cum-prev)*1e3:8.2f} ms",
          flush=True)
    prev = cum

prev = 0.0
print("== post internals (each includes full prep+kernel) ==")
for upto in POST_CUTS:
    cum = run(upto, jax.jit(lambda p, upto=upto: post_variant(p, upto)))
    print(f"{upto:>12}: cumulative {cum*1e3:8.2f} ms   delta {(cum-prev)*1e3:8.2f} ms",
          flush=True)
    prev = cum
