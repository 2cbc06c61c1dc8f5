"""Pool-build lowering variants at 2048^2 (delta method in a fori_loop)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fractencode_tpu.decode.decoder import _half_sums_u16, _patch_tap_tables

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = 30

H = W = SIZE
sw, ts, step = 16, 4, 8
nx = (W - sw) // step + 1
ny = (H - sw) // step + 1
s2 = step // 2
pos, tap_idx = _patch_tap_tables(sw, ts, W)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))


def slices(half4):
    return [
        jax.lax.slice(
            half4, (dy, dx),
            (dy + (ny - 1) * s2 + 1, dx + (nx - 1) * s2 + 1),
            (s2, s2),
        ).reshape(-1)
        for dy, dx in pos
    ]


def v_current(img):
    half4 = _half_sums_u16(img)
    base = jnp.stack(slices(half4)).T
    vals = base[:, jnp.asarray(tap_idx[:4].reshape(-1))]
    return vals.reshape(-1)


def v_stack1(img):
    half4 = _half_sums_u16(img)
    base = jnp.stack(slices(half4), axis=1)  # [D, U] directly
    vals = base[:, jnp.asarray(tap_idx[:4].reshape(-1))]
    return vals.reshape(-1)


def v_stack1_noreindex(img):
    # order the slices by tap (t, k) directly: tap_idx becomes identity
    half4 = _half_sums_u16(img)
    order = tap_idx[:4].reshape(-1)
    pl = slices(half4)
    base = jnp.stack([pl[u] for u in order], axis=1)  # [D, T*K]
    return base.reshape(-1)


def v_slices_only(img):
    half4 = _half_sums_u16(img)
    acc = jnp.zeros((ny * nx,), jnp.uint16)
    for p in slices(half4):
        acc = acc + p
    return acc


def v_half_only(img):
    return _half_sums_u16(img).reshape(-1)[: ny * nx]


for name, fn in (("half_only", v_half_only), ("slices_only", v_slices_only),
                 ("current(T)", v_current), ("stack_ax1", v_stack1),
                 ("stack_ax1_noreidx", v_stack1_noreindex)):
    @jax.jit
    def loop(x, n, fn=fn):
        def body(_, im):
            out = fn(im)
            # full-array dependency so nothing is DCE'd; the i32 reduce is a
            # constant overhead shared by every variant
            probe = jnp.sum(out.astype(jnp.int32)) & 1
            return (im + probe.astype(jnp.uint8)).astype(jnp.uint8)
        return jax.lax.fori_loop(0, n, body, x)[0, 0].astype(jnp.int32)

    int(loop(img, 2))
    times = {}
    for n in (2, STEPS + 2):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(img, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    print(f"{name:20s} {(times[STEPS+2]-times[2])/STEPS*1e6:9.1f} us/step")


def v_phase_split(img):
    """Split half4 into 16 (row, col) phase images first; the 64 patch
    slices then become contiguous 2D slices."""
    half4 = _half_sums_u16(img)
    phases = {}
    for a in range(s2):
        for b in range(s2):
            phases[(a, b)] = jax.lax.slice(
                half4, (a, b), (half4.shape[0], half4.shape[1]), (s2, s2))
    planes = []
    for dy, dx in pos:
        X = phases[(dy % s2, dx % s2)]
        planes.append(
            jax.lax.slice(X, (dy // s2, dx // s2),
                          (dy // s2 + ny, dx // s2 + nx)).reshape(-1))
    base = jnp.stack(planes).T
    vals = base[:, jnp.asarray(tap_idx[:4].reshape(-1))]
    return vals.reshape(-1)


def v_colphase(img):
    """Column-phase split only: 4 lane-strided slices, then 64 row-strided."""
    half4 = _half_sums_u16(img)
    cols = [jax.lax.slice(half4, (0, b), half4.shape, (1, s2))
            for b in range(s2)]
    planes = []
    for dy, dx in pos:
        Y = cols[dx % s2]
        planes.append(
            jax.lax.slice(Y, (dy, dx // s2),
                          (dy + (ny - 1) * s2 + 1, dx // s2 + nx),
                          (s2, 1)).reshape(-1))
    base = jnp.stack(planes).T
    vals = base[:, jnp.asarray(tap_idx[:4].reshape(-1))]
    return vals.reshape(-1)


for name, fn in (("phase_split", v_phase_split), ("colphase", v_colphase)):
    @jax.jit
    def loop(x, n, fn=fn):
        def body(_, im):
            out = fn(im)
            probe = jnp.sum(out.astype(jnp.int32)) & 1
            return (im + probe.astype(jnp.uint8)).astype(jnp.uint8)
        return jax.lax.fori_loop(0, n, body, x)[0, 0].astype(jnp.int32)

    int(loop(img, 2))
    times = {}
    for n in (2, STEPS + 2):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(img, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    print(f"{name:20s} {(times[STEPS+2]-times[2])/STEPS*1e6:9.1f} us/step")
