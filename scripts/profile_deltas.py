"""Delta profiling of the classed encode pipeline on the attached TPU.

Times a sequence of TRUNCATED variants of the one fused encode program, each
returning just enough to force its prefix of the pipeline; consecutive
differences isolate per-stage cost without the per-dispatch tunnel floor
(every variant pays the same floor).  XLA dead-code-eliminates everything
after the returned values.
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
    # full reductions force every output to be fully computed while keeping
    # the host transfer to ONE scalar for every variant (the tunnel RTT per
    # pull is ~15-40 ms and would otherwise dominate the deltas)
    acc = jnp.float32(0)
    for a in arrays:
        acc = acc + jnp.sum(a.astype(jnp.float32))
    return acc


def pipeline(p, upto: str):
    pf = p.astype(jnp.float32)
    cb = build_codebook(pf, domain_grid, cfg.target_size, cfg.num_transforms)
    ranges = extract_ranges(pf, cfg.target_size)
    sum_a = ranges.sum(-1)
    sum_a2 = (ranges * ranges).sum(-1)
    if upto == "codebook":
        return _checksum(cb.values, sum_a, sum_a2)
    dcls = classify_grid(p, domain_grid)
    rcls = classify_grid(p, range_grid)
    if upto == "classify":
        return _checksum(cb.values, sum_a, sum_a2, dcls, rcls)
    prep = classed_prep(ranges, sum_a, sum_a2, cb, rcls, dcls, cfg)
    if upto == "prep":
        big = prep["ranges_s"] if prep["ranges_s"] is not None else prep["ai_s"]
        cols = prep["cb_s"] if prep["cb_s"] is not None else prep["ch_s"]
        return _checksum(big, cols, prep["sb_s"], prep["aux_s"],
                         prep["pairs"], prep["rpos"], prep["inv_col"])
    r, _ = ranges.shape
    d, t, _ = cb.values.shape
    block_r, block_m, _, _, worst_pairs, p_cap, _ = _classed_statics(r, d * t, cfg)
    dist_s, idx_s, q_s = classed_kernel(prep, K, cfg.source_size ** 2, block_r,
                                        block_m, p_cap, worst_pairs, cfg, False)
    if upto == "kernel":
        return _checksum(q_s, idx_s, prep["rpos"], prep["inv_col"])
    res = classed_post(dist_s, idx_s, q_s, prep["rpos"], prep["inv_col"],
                       ranges, sum_a, sum_a2, cb, cfg, b4_cols=prep["b4_cols"])
    return _checksum(res.domain_idx, res.s, res.o, res.distance)


STAGES = ["codebook", "classify", "prep", "kernel", "post"]
fns = {s: jax.jit(lambda p, s=s: pipeline(p, s)) for s in STAGES}

prev = 0.0
for s in STAGES:
    out = fns[s](plane)
    float(out)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(fns[s](plane))
        ts.append(time.perf_counter() - t0)
    cum = min(ts)
    print(f"{s:>9}: cumulative {cum * 1e3:8.2f} ms   delta {(cum - prev) * 1e3:8.2f} ms")
    prev = cum
