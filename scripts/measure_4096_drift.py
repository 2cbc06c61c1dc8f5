"""4096^2 encode timing distribution (VERDICT r4 #4: diagnose the drift).

Runs >= 5 timed reps (after warmup) and prints min/median/max plus every
sample, so tunnel variance is visible instead of a single min hiding it.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from fractencode_tpu import EncoderConfig, encode_plane
from fractencode_tpu.image import load_gray

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 7

plane = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
plane = np.tile(plane, (8, 8))[:4096, :4096]
p = jnp.asarray(plane)
jnp.add(p, 0).block_until_ready()

cfg = EncoderConfig()
res = encode_plane(p, cfg)
np.asarray(res.domain_idx)  # compile + warmup

samples = []
for i in range(REPS):
    t0 = time.perf_counter()
    res = encode_plane(p, cfg)
    np.asarray(res.s)
    samples.append((time.perf_counter() - t0) * 1e3)
    print(f"rep {i}: {samples[-1]:.1f} ms", flush=True)

s = np.array(samples)
print(f"min={s.min():.1f} median={np.median(s):.1f} max={s.max():.1f} "
      f"spread={(s.max() - s.min()) / s.min() * 100:.1f}%")
