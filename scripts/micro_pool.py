"""Microbench: decode pool-build and row-gather variants at 2048^2."""
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
STEPS = 30

plane_np = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
reps = -(-SIZE // plane_np.shape[0])
plane_np = np.tile(plane_np, (reps, reps))[:SIZE, :SIZE]
cfg = EncoderConfig()
res = encode_plane(plane_np, cfg)
jax.block_until_ready(res.s)
kind, idx = _build_indices(res)
assert kind == "cb"
code, pos, tap_idx, ny, nx, s2 = idx
code = jnp.asarray(code)
tap_flat = jnp.asarray(tap_idx.reshape(-1))
t_n, k_n = tap_idx.shape
H = W = SIZE
img0 = jnp.asarray(plane_np)


def pool_slices(img):
    half = half_res_image(img)
    planes = [
        jax.lax.slice(
            half, (dy, dx),
            (dy + (ny - 1) * s2 + 1, dx + (nx - 1) * s2 + 1),
            (s2, s2),
        ).reshape(-1)
        for dy, dx in pos
    ]
    return jnp.stack(planes).T  # [D, U]


def pool_rw(img):
    # window-2 stride-2*s2 reduce_window straight off the full image:
    # no half-image materialization, no strided slices
    f = img.astype(jnp.float32)
    planes = [
        (jax.lax.reduce_window(
            jax.lax.slice(
                f, (2 * dy, 2 * dx),
                (2 * dy + (ny - 1) * 2 * s2 + 2, 2 * dx + (nx - 1) * 2 * s2 + 2)),
            0.0, jax.lax.add, (2, 2), (2 * s2, 2 * s2), "VALID",
        ) * 0.25).reshape(-1)
        for dy, dx in pos
    ]
    return jnp.stack(planes).T


def pool_rw_stack(img):
    # one batched reduce_window over stacked shifted views
    f = img.astype(jnp.float32)
    views = jnp.stack([
        jax.lax.slice(
            f, (2 * dy, 2 * dx),
            (2 * dy + (ny - 1) * 2 * s2 + 2, 2 * dx + (nx - 1) * 2 * s2 + 2))
        for dy, dx in pos
    ])  # [U, h', w']
    s = jax.lax.reduce_window(
        views, 0.0, jax.lax.add, (1, 2, 2), (1, 2 * s2, 2 * s2), "VALID")
    return (s.reshape(len(pos), -1) * 0.25).T


def bench(name, fn, check_against=None):
    @jax.jit
    def run(img):
        def body(_, acc):
            v = fn(img + acc.astype(jnp.uint8)).sum()
            return jnp.uint8(v.astype(jnp.int32) % 7)
        return jax.lax.fori_loop(0, STEPS, body, jnp.uint8(0))

    out = np.asarray(jax.jit(fn)(img0))
    ok = (np.array_equal(out, check_against)
          if check_against is not None else True)
    run(img0).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        run(img0).block_until_ready()
    dt = (time.perf_counter() - t0) / 3 / STEPS
    print(f"{name:>16}: {dt*1e6:8.1f} us/step  exact={ok}")
    return out


ref = bench("pool_slices", pool_slices)
bench("pool_rw", pool_rw, ref)
bench("pool_rw_stack", pool_rw_stack, ref)

# row-gather variants on a fixed pool
base = jax.jit(pool_slices)(img0)
vals_f32 = jnp.asarray(base)[:, tap_flat].reshape(ny * nx * t_n, k_n)
vals_u16 = (vals_f32 * 4.0).astype(jnp.uint16)
code_sorted = jnp.sort(code)


def g_f32(p, c):
    return p[c]


for name, pool, c in [
    ("gather_f32", vals_f32, code),
    ("gather_u16", vals_u16, code),
    ("gather_f32_sorted", vals_f32, code_sorted),
]:
    @jax.jit
    def run(p, c=c):
        def body(_, acc):
            v = (p + acc)[c].sum()
            return (v.astype(jnp.int32) % 7).astype(p.dtype)
        return jax.lax.fori_loop(0, STEPS, body, p.dtype.type(0))

    run(pool).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        run(pool).block_until_ready()
    dt = (time.perf_counter() - t0) / 3 / STEPS
    print(f"{name:>16}: {dt*1e6:8.1f} us/step")
