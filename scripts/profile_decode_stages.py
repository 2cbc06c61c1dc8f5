"""Stage-isolated decode-step cost on TPU (truncated-variant deltas).

Each variant runs N fori_loop steps whose body computes the decode step only
up to a cut point, reduces that cut's output to a scalar, and feeds it back
into the carried image (keeping the loop data-dependent).  Consecutive
variant differences isolate each stage without per-dispatch floors.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fractencode_tpu import EncoderConfig, encode_plane
from fractencode_tpu.decode.decoder import _build_indices, half_res_image
from fractencode_tpu.image import load_gray

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30

plane_np = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
reps = -(-SIZE // plane_np.shape[0])
plane_np = np.tile(plane_np, (reps, reps))[:SIZE, :SIZE]

cfg = EncoderConfig()
res = encode_plane(plane_np, cfg)
jax.block_until_ready(res.s)

kind, idx = _build_indices(res)
assert kind == "cb", kind
code, pos, tap_idx, ny, nx, s2 = idx
code = jnp.asarray(code)
tap_flat = jnp.asarray(tap_idx.reshape(-1))
s = jnp.where(res.valid, res.s, 0.0)
o = jnp.where(res.valid, res.o, 0.0)
h = w = SIZE
ts = cfg.target_size
t_n, k_n = tap_idx.shape


def stage(img, cut):
    half = half_res_image(img)
    if cut == 0:
        return half.sum()
    planes = [
        jax.lax.slice(
            half, (dy, dx),
            (dy + (ny - 1) * s2 + 1, dx + (nx - 1) * s2 + 1),
            (s2, s2),
        ).reshape(-1)
        for dy, dx in pos
    ]
    base = jnp.stack(planes).T
    if cut == 1:
        return base.sum()
    vals = base[:, tap_flat].reshape(ny * nx * t_n, k_n)
    if cut == 2:
        return vals.sum()
    samp = vals[code]
    if cut == 3:
        return samp.sum()
    out = s[:, None] * samp + o[:, None]
    out = jnp.floor(jnp.clip(out, 0.0, 255.0)).astype(jnp.uint8)
    nyr = h // ts
    nxr = w // ts
    return (
        out.reshape(nyr, nxr, ts, ts)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
        .astype(jnp.float32)
        .sum()
    )


def run(cut):
    @jax.jit
    def f(img):
        def body(_, im):
            v = stage(im, cut)
            return im + v.astype(jnp.uint8)
        out = jax.lax.fori_loop(0, STEPS, body, img)
        return out.astype(jnp.int32).sum()

    init = jnp.full((h, w), 100, dtype=jnp.uint8)
    int(f(init))
    t0 = time.perf_counter()
    for _ in range(3):
        int(f(init))
    return (time.perf_counter() - t0) / 3


names = ["half_res", "+pool(slices+T)", "+reindex", "+rowgather", "+affine/tile"]
prev = 0.0
base_t = None
for cut, name in enumerate(names):
    t = run(cut)
    if base_t is None:
        print(f"{name:>18}: {t/STEPS*1e6:8.1f} us/step (abs)")
    else:
        print(f"{name:>18}: {(t-prev)/STEPS*1e6:8.1f} us/step (delta) "
              f"[cum {t/STEPS*1e6:.1f}]")
    prev = t
    if base_t is None:
        base_t = t
