"""Per-scale decode-step cost (delta method over a 30-step fori_loop)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fractencode_tpu import EncoderConfig, encode_plane
from fractencode_tpu.decode.decoder import _decode_step, build_decode_tables
from fractencode_tpu.image import load_gray

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = 30

plane = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
reps = -(-SIZE // plane.shape[0])
plane = np.tile(plane, (reps, reps))[:SIZE, :SIZE]
cfg = EncoderConfig()
res = encode_plane(plane, cfg)
jax.block_until_ready(res.s)
s = jnp.where(res.valid, res.s, 0.0)
o = jnp.where(res.valid, res.o, 0.0)

for f in (1, 2, 4):
    hf, wf = SIZE // f, SIZE // f
    tsf = cfg.target_size // f
    tables = build_decode_tables(
        res.domain_idx, res.transform, wf, hf, res.source_size // f,
        tsf, res.domain_step // f, res.num_transforms)

    @jax.jit
    def loop(img, n, tables=tables, hf=hf, wf=wf, tsf=tsf):
        return jax.lax.fori_loop(
            0, n,
            lambda _, im: _decode_step(im, tables, s, o, hf, wf, tsf,
                                       res.o_is_mean),
            img)

    img0 = jnp.full((hf, wf), 100, jnp.uint8)
    np.asarray(loop(img0, 2))[0, 0]
    times = {}
    for n in (2, STEPS + 2):
        ts_ = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(img0, n))[0, 0]
            ts_.append(time.perf_counter() - t0)
        times[n] = min(ts_)
    per = (times[STEPS + 2] - times[2]) / STEPS
    print(f"f={f}: {per*1e6:9.1f} us/step  (kind={tables[0]})")
