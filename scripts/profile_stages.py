"""Per-stage timing of the 512^2 default encode on the attached TPU.

Each stage is jitted separately; a host transfer of one element is the
completion barrier (block_until_ready can return early over the tunnel).
Stage boundaries mirror encoder._encode_plane_impl.
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
from fractencode_tpu.core.stats import integral_image
from fractencode_tpu.encode.codebook import build_codebook, extract_ranges
from fractencode_tpu.encode.matcher import (
    _classed_statics, classed_kernel, classed_post, classed_prep,
)
from fractencode_tpu.image import load_gray

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512

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


def timed(name, fn, *args, reps=10):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:>12}: {min(ts)*1e3:8.2f} ms")
    return out


@jax.jit
def stage_prep_inputs(p):
    pf = p.astype(jnp.float32)
    cb = build_codebook(pf, domain_grid, cfg.target_size, cfg.num_transforms)
    ranges = extract_ranges(pf, cfg.target_size)
    return cb, ranges, ranges.sum(-1), (ranges * ranges).sum(-1)


@jax.jit
def stage_classify(p):
    ii = integral_image(p)
    return classify_grid(p, domain_grid, ii=ii), classify_grid(p, range_grid, ii=ii)


cb, ranges, sum_a, sum_a2 = timed("codebook", stage_prep_inputs, plane)
dcls, rcls = timed("classify", stage_classify, plane)

r, k = ranges.shape
d, t, _ = cb.values.shape
m = d * t
block_r, block_m, r_pad, m_pad, worst_pairs, p_cap, _ = _classed_statics(r, m, cfg)

prep_jit = jax.jit(
    lambda rg, sa, sa2, c, rc, dc: classed_prep(rg, sa, sa2, c, rc, dc, cfg)
)
prep = timed("layout", prep_jit, ranges, sum_a, sum_a2, cb, rcls, dcls)

kern_jit = jax.jit(
    lambda pr: classed_kernel(pr, k, cfg.source_size ** 2, block_r, block_m,
                              p_cap, worst_pairs, cfg, False)
)
dist_idx = timed("kernel", kern_jit, prep)

post_jit = jax.jit(
    lambda di, pr, rg, sa, sa2, c: classed_post(
        di[0], di[1], di[2], pr["rpos"], pr["inv_col"], rg, sa, sa2, c, cfg,
        b4_cols=pr["b4_cols"], inv_dom=pr["inv_dom"])
)
timed("post", post_jit, dist_idx, prep, ranges, sum_a, sum_a2, cb)


# whole-program single frame for comparison
from fractencode_tpu import encode_plane
from fractencode_tpu.encode import encode_batch


def whole(p):
    res = encode_plane(p, cfg)
    return res.domain_idx


timed("whole", whole, plane, reps=5)

if SIZE == 512:
    batch = jnp.asarray(np.stack([plane_np] * 16))
    jnp.add(batch, 0).block_until_ready()

    def whole_batch(b):
        outs = encode_batch(b, cfg)
        return outs[-1].domain_idx

    timed("batch16", whole_batch, batch, reps=3)
