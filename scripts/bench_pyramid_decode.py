"""A/B the coarse-to-fine (pyramid) decode init vs the flat start.

Usage: python scripts/bench_pyramid_decode.py [size] [reps]
Set JAX_PLATFORMS=cpu for a correctness-only run.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fractencode_tpu import DecoderConfig, EncoderConfig, encode_plane
from fractencode_tpu.codec import pack_result, unpack_result
from fractencode_tpu.decode import decode_plane
from fractencode_tpu.image import load_gray

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

plane = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
reps = -(-SIZE // plane.shape[0])
plane = np.tile(plane, (reps, reps))[:SIZE, :SIZE]

res_raw = encode_plane(plane, EncoderConfig())
jax.block_until_ready(res_raw.s)
res_q = unpack_result(pack_result(res_raw, plane=plane))
jax.block_until_ready(res_q.s)


def run(res, dcfg, label):
    out, iters, mse = decode_plane(res, dcfg)
    out_np = np.asarray(out)  # warmup + pull
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        o2, it2, m2 = decode_plane(res, dcfg)
        float(m2)
        times.append(time.perf_counter() - t0)
    err = ((out_np.astype(np.float64) - plane.astype(np.float64)) ** 2).mean()
    psnr = 10 * np.log10(255.0**2 / max(err, 1e-9))
    print(f"{label:28s} {min(times)*1e3:8.2f} ms  iters={int(iters):3d} "
          f"psnr={psnr:7.3f}")
    return out_np


for name, res in (("raw", res_raw), ("quantized", res_q)):
    base = run(res, DecoderConfig(), f"{name} flat")
    pyr = run(res, DecoderConfig(pyramid=True), f"{name} pyramid")
    d = np.abs(base.astype(int) - pyr.astype(int))
    print(f"  pixel diff vs flat: n={int((d > 0).sum())} max={int(d.max())}")
