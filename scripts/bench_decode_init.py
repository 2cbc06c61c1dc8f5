"""Measure decode iterations/latency: flat-100 vs block-mean init, plus
stacked batch decode throughput, on the attached TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import dataclasses

import jax
import jax.numpy as jnp

from fractencode_tpu import DecoderConfig, EncoderConfig, decode_plane, encode_plane
from fractencode_tpu.decode import decode_batch_stacked
from fractencode_tpu.encode import encode_batch_stacked
from fractencode_tpu.image import load_gray

plane512 = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))

def tile(n):
    reps = -(-n // 512)
    return np.tile(plane512, (reps, reps))[:n, :n]

def timed(fn, probe, reps=3):
    probe(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); probe(fn()); ts.append(time.perf_counter() - t0)
    return min(ts)

for size in (512, 2048):
    p = jnp.asarray(tile(size))
    jnp.add(p, 0).block_until_ready()
    res = encode_plane(p, EncoderConfig())
    np.asarray(res.s)
    for label, dcfg in [("flat", DecoderConfig()),
                        ("means", DecoderConfig(initial="means"))]:
        out, it, mse = decode_plane(res, dcfg)
        outn = np.asarray(out).astype(np.float64)
        ps = 10*np.log10(255**2 / max(((outn - np.asarray(p))**2).mean(), 1e-9))
        dt = timed(lambda: decode_plane(res, dcfg), lambda r: float(r[2]))
        print(f"{size} {label}: {dt*1e3:.2f} ms iters={int(it)} psnr={ps:.3f}")

# batch decode throughput (16 frames, 512^2)
batch = jnp.asarray(np.stack([plane512] * 16))
res_b = encode_batch_stacked(batch, EncoderConfig())
np.asarray(res_b.s[-1])
for label, dcfg in [("flat", DecoderConfig()),
                    ("means", DecoderConfig(initial="means"))]:
    dt = timed(lambda: decode_batch_stacked(res_b, dcfg),
               lambda r: float(np.asarray(r[2][-1])))
    fps = 16 / dt
    print(f"batch16 {label}: {dt*1e3:.1f} ms total, {fps:.1f} frames/s, "
          f"{16*512*512/dt/1e6:.1f} Mpix/s")
