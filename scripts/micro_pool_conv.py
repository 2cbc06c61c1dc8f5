"""A/B the decode pool build: 64 strided slices vs one-hot im2col conv."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from fractencode_tpu import EncoderConfig, encode_plane
from fractencode_tpu.decode.decoder import _build_indices, _half_sums_u16
from fractencode_tpu.image import load_gray

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
plane_np = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
reps = -(-SIZE // 512)
plane_np = np.tile(plane_np, (reps, reps))[:SIZE, :SIZE]
cfg = EncoderConfig()
res = encode_plane(plane_np, cfg)
jax.block_until_ready(res.s)
kind, idx = _build_indices(res)
assert kind == "cb"
code, pos, tap_idx, ny, nx, s2 = idx
img = jnp.asarray(plane_np)
jnp.add(img, 0).block_until_ready()
sw = cfg.source_size
step = cfg.domain_step

# one-hot kernel [sw, sw, 1, U]: channel u sums the 2x2 full-res cell at
# half-coords pos[u]
U = len(pos)
kern = np.zeros((sw, sw, 1, U), np.float32)
for u, (dy, dx) in enumerate(pos):
    for a in range(2):
        for b in range(2):
            kern[2 * dy + a, 2 * dx + b, 0, u] = 1.0
kern = jnp.asarray(kern)

def pool_slices(im):
    half4 = _half_sums_u16(im)
    planes = [
        jax.lax.slice(half4, (dy, dx),
                      (dy + (ny - 1) * s2 + 1, dx + (nx - 1) * s2 + 1),
                      (s2, s2)).reshape(-1)
        for dy, dx in pos
    ]
    return jnp.stack(planes).T  # [D, U] u16

def pool_conv(im):
    x = im.astype(jnp.float32)[None, :, :, None]
    out = jax.lax.conv_general_dilated(
        x, kern, window_strides=(step, step), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0].reshape(ny * nx, U).astype(jnp.uint16)

f1 = jax.jit(lambda im: pool_slices(im).astype(jnp.int32).sum())
f2 = jax.jit(lambda im: pool_conv(im).astype(jnp.int32).sum())
a, b = int(f1(img)), int(f2(img))
print("checksums", a, b, "equal:", a == b)
# bitwise
pa = np.asarray(jax.jit(pool_slices)(img))
pb = np.asarray(jax.jit(pool_conv)(img))
print("bitwise equal:", np.array_equal(pa, pb))
for name, f in (("slices", f1), ("conv", f2)):
    int(f(img))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); int(f(img)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:.3f} ms")

# delta method: N chained pool builds inside one jit
def loop(fn, n):
    @jax.jit
    def g(im):
        def body(_, carry):
            im2, acc = carry
            p = fn(im2)
            chk = p.astype(jnp.int32).sum()
            # feed a data dependency back into the image (cheap, u8-safe)
            return im2 ^ (chk % 2).astype(jnp.uint8), acc + chk
        return jax.lax.fori_loop(0, n, body, (im, jnp.int32(0)))[1]
    v = int(g(img))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); int(g(img)); ts.append(time.perf_counter()-t0)
    return min(ts), v

for name, f in (("slices", pool_slices), ("conv", pool_conv)):
    t0_, _ = loop(f, 0)
    tN_, _ = loop(f, 30)
    print(f"{name}: {(tN_-t0_)/30*1e3:.3f} ms/build")
