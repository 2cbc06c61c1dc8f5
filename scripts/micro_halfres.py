"""Microbench: 2x2 box-downsample lowerings at 2048^2 u8 on TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

H = W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = 30

img0 = jnp.asarray(np.random.randint(0, 256, (H, W), np.uint8))


def v_reshape(x):
    f = x.astype(jnp.float32).reshape(H // 2, 2, W // 2, 2)
    return f.sum(axis=(1, 3)) * 0.25


def v_strided(x):
    f = x.astype(jnp.float32)
    return (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]) * 0.25


def v_strided_u16(x):
    s = (x[0::2, 0::2].astype(jnp.uint16) + x[0::2, 1::2]
         + x[1::2, 0::2] + x[1::2, 1::2])
    return s.astype(jnp.float32) * 0.25


def v_reduce_window(x):
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (2, 2), (2, 2), "VALID")
    return s * 0.25


def v_sublane_then_lane(x):
    f = x.astype(jnp.float32)
    a = f.reshape(H // 2, 2, W).sum(axis=1)  # sublane pairs: fine
    b = a[:, 0::2] + a[:, 1::2]
    return b * 0.25


def v_matmul(x):
    # lane-dim pair sums as a [W, W/2] f32 matmul on the MXU
    f = x.astype(jnp.float32)
    a = f.reshape(H // 2, 2, W).sum(axis=1)
    sel = jnp.zeros((W, W // 2), jnp.float32)
    sel = sel.at[jnp.arange(W), jnp.arange(W) // 2].set(1.0)
    return (a @ sel) * 0.25


VARIANTS = [v_reshape, v_strided, v_strided_u16, v_reduce_window,
            v_sublane_then_lane, v_matmul]

ref = None
for fn in VARIANTS:
    @jax.jit
    def run(img, fn=fn):
        def body(_, acc):
            h = fn(img + acc.astype(jnp.uint8))
            return jnp.uint8(h.sum() % 7)
        return jax.lax.fori_loop(0, STEPS, body, jnp.uint8(0))

    out = np.asarray(jax.jit(fn)(img0))
    if ref is None:
        ref = out
    ok = np.array_equal(out, ref)
    run(img0).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        run(img0).block_until_ready()
    dt = (time.perf_counter() - t0) / 3 / STEPS
    print(f"{fn.__name__:>22}: {dt*1e6:8.1f} us/step  exact={ok}")


def v_rw_u16(x):
    s = jax.lax.reduce_window(
        x.astype(jnp.uint16), np.uint16(0), jax.lax.add, (2, 2), (2, 2), "VALID")
    return s.astype(jnp.float32) * 0.25


def v_rw_i32(x):
    s = jax.lax.reduce_window(
        x.astype(jnp.int32), 0, jax.lax.add, (2, 2), (2, 2), "VALID")
    return s.astype(jnp.float32) * 0.25


def v_sub_T_sub_T(x):
    f = x.astype(jnp.float32)
    a = f.reshape(H // 2, 2, W).sum(axis=1)        # [H/2, W]
    at = a.T                                        # [W, H/2]
    b = at.reshape(W // 2, 2, H // 2).sum(axis=1)   # [W/2, H/2]
    return b.T * 0.25


def v_rw_lane_only(x):
    f = x.astype(jnp.float32)
    a = f.reshape(H // 2, 2, W).sum(axis=1)
    s = jax.lax.reduce_window(a, 0.0, jax.lax.add, (1, 2), (1, 2), "VALID")
    return s * 0.25


for fn in [v_rw_u16, v_rw_i32, v_sub_T_sub_T, v_rw_lane_only]:
    @jax.jit
    def run(img, fn=fn):
        def body(_, acc):
            h = fn(img + acc.astype(jnp.uint8))
            return jnp.uint8(h.sum() % 7)
        return jax.lax.fori_loop(0, STEPS, body, jnp.uint8(0))

    out = np.asarray(jax.jit(fn)(img0))
    ok = np.array_equal(out, ref)
    run(img0).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        run(img0).block_until_ready()
    dt = (time.perf_counter() - t0) / 3 / STEPS
    print(f"{fn.__name__:>22}: {dt*1e6:8.1f} us/step  exact={ok}")


def v_bitcast_u16(x):
    v = jax.lax.bitcast_convert_type(x.reshape(H, W // 2, 2), jnp.uint16)
    lane = (v & 255) + (v >> 8)                      # [H, W/2] u16
    s = lane.reshape(H // 2, 2, W // 2).sum(axis=1)  # sublane pairs
    return s.astype(jnp.float32) * 0.25


def v_bitcast_u32(x):
    v = jax.lax.bitcast_convert_type(x.reshape(H, W // 4, 4), jnp.uint32)
    lane = (v & 255) + ((v >> 8) & 255) + ((v >> 16) & 255) + (v >> 24)
    # lane holds 4-wide sums: [H, W/4] of x[:, 4j]+x[:, 4j+1]+x[:, 4j+2]+x[:, 4j+3]
    return lane  # NOT the same result; timing probe only


for fn in [v_bitcast_u16]:
    @jax.jit
    def run(img, fn=fn):
        def body(_, acc):
            h = fn(img + acc.astype(jnp.uint8))
            return jnp.uint8(h.sum() % 7)
        return jax.lax.fori_loop(0, STEPS, body, jnp.uint8(0))

    out = np.asarray(jax.jit(fn)(img0))
    ok = np.array_equal(out.astype(np.float32), ref)
    run(img0).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        run(img0).block_until_ready()
    dt = (time.perf_counter() - t0) / 3 / STEPS
    print(f"{fn.__name__:>22}: {dt*1e6:8.1f} us/step  exact={ok}")
