"""Per-step decode cost on the attached TPU.

Runs N fixed decode steps inside ONE jitted fori_loop (no per-step dispatch),
pulls one checksum scalar; reports (total - floor) / N.  Floor is estimated
from a 0-step variant of the same program.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fractencode_tpu import EncoderConfig, encode_plane
from fractencode_tpu.decode.decoder import _build_indices, _decode_step
from fractencode_tpu.image import load_gray

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

plane_np = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
reps = -(-SIZE // plane_np.shape[0])
plane_np = np.tile(plane_np, (reps, reps))[:SIZE, :SIZE]

cfg = EncoderConfig()
res = encode_plane(plane_np, cfg)
jax.block_until_ready(res.s)

idx = _build_indices(res)
s = jnp.where(res.valid, res.s, 0.0)
o = jnp.where(res.valid, res.o, 0.0)
h = w = SIZE


def run(n):
    @jax.jit
    def f(img):
        def body(_, im):
            return _decode_step(im, idx, s, o, h, w, cfg.target_size)
        out = jax.lax.fori_loop(0, n, body, img)
        return out.astype(jnp.int32).sum()
    init = jnp.full((h, w), 100, dtype=jnp.uint8)
    v = int(f(init))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(3):
        v = int(f(init))
    return (time.perf_counter() - t0) / 3, v


t0, _ = run(0)
tN, chk = run(STEPS)
print(f"size={SIZE} steps={STEPS} floor={t0*1e3:.2f} ms "
      f"total={tN*1e3:.2f} ms per-step={(tN-t0)/STEPS*1e6:.1f} us chk={chk}")
