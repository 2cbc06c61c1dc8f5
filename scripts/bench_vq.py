"""Speed/PSNR tradeoff of the learned VQ prune at 2048^2 (PERF_NOTES entry)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from fractencode_tpu import DecoderConfig, EncoderConfig, decode_plane, encode_plane
from fractencode_tpu.image import load_gray

plane = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
plane = np.tile(plane, (4, 4))[:2048, :2048]
p = jnp.asarray(plane)
jnp.add(p, 0).block_until_ready()

for label, cfg in [
    ("brightness6", EncoderConfig()),
    ("vq4", EncoderConfig(vq_classes=4)),
    ("vq6", EncoderConfig(vq_classes=6)),
    ("noclassifier", EncoderConfig(use_classifier=False)),
]:
    res = encode_plane(p, cfg)
    np.asarray(res.domain_idx)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = encode_plane(p, cfg)
        np.asarray(res.s)
        ts.append(time.perf_counter() - t0)
    out, _, _ = decode_plane(res)
    mse = ((np.asarray(out).astype(np.float64) - plane) ** 2).mean()
    print(f"{label}: {min(ts)*1e3:.1f} ms psnr={10*np.log10(255**2/max(mse,1e-9)):.3f}")
