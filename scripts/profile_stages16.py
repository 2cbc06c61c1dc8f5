"""Batched (x16) per-stage timing: amortizes the tunnel dispatch floor."""
import sys, time
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
    _classed_statics, classed_kernel, classed_post, classed_prep)
from fractencode_tpu.image import load_gray

B = 16
plane_np = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
batch = jnp.asarray(np.stack([plane_np] * B))
jnp.add(batch, 0).block_until_ready()
cfg = EncoderConfig()
h, w = plane_np.shape
domain_grid = uniform_grid(w, h, cfg.source_size, cfg.domain_step)
range_grid = uniform_grid(w, h, cfg.target_size, cfg.target_size)

def timed(name, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:>12}: {min(ts)*1e3:8.2f} ms total, {(min(ts))/B*1e3:7.3f} ms/frame")
    return out

def prep_inputs(p):
    pf = p.astype(jnp.float32)
    cb = build_codebook(pf, domain_grid, cfg.target_size, cfg.num_transforms)
    ranges = extract_ranges(pf, cfg.target_size)
    return cb, ranges, ranges.sum(-1), (ranges * ranges).sum(-1)

def classify(p):
    ii = integral_image(p)
    return classify_grid(p, domain_grid, ii=ii), classify_grid(p, range_grid, ii=ii)

cb16 = timed("codebook", jax.jit(lambda b: jax.lax.map(prep_inputs, b)), batch)
cls16 = timed("classify", jax.jit(lambda b: jax.lax.map(classify, b)), batch)

# single-frame arrays for the downstream stages
cb, ranges, sum_a, sum_a2 = jax.jit(prep_inputs)(batch[0])
dcls, rcls = jax.jit(classify)(batch[0])
r, k = ranges.shape
d, t, _ = cb.values.shape
m = d * t
block_r, block_m, r_pad, m_pad, worst_pairs, p_cap, _ = _classed_statics(r, m, cfg)

def rep16(x):
    return jax.tree_util.tree_map(lambda a: jnp.stack([a] * B), x)

args16 = rep16((ranges, sum_a, sum_a2, cb, rcls, dcls))
prep16 = timed("layout", jax.jit(lambda a: jax.lax.map(
    lambda xs: classed_prep(*xs, cfg), a)), args16)

kern16 = timed("kernel", jax.jit(lambda pr: jax.lax.map(
    lambda p: classed_kernel(p, k, cfg.source_size ** 2, block_r, block_m,
                             p_cap, worst_pairs, cfg, False), pr)), prep16)

post_in = (kern16[0], kern16[1], kern16[2], prep16["rpos"],
           prep16["inv_dom"], args16[0], args16[1], args16[2], args16[3],
           prep16["b4_cols"])
timed("post", jax.jit(lambda a: jax.lax.map(
    lambda xs: classed_post(xs[0], xs[1], xs[2], xs[3], None, xs[5], xs[6],
                            xs[7], xs[8], cfg, b4_cols=xs[9],
                            inv_dom=xs[4]), a)), post_in)
