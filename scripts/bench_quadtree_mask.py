"""A/B the round-4 coverage-masked quadtree search at 1024^2 on the TPU."""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from fractencode_tpu import EncoderConfig
from fractencode_tpu.encode.quadtree import QuadtreeConfig, encode_plane_quadtree
from fractencode_tpu.image import load_gray

plane = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
plane = np.tile(plane, (2, 2))[:1024, :1024]
p = jnp.asarray(plane)
jnp.add(p, 0).block_until_ready()

cfg = EncoderConfig()
for label, qcfg in [
    ("masked", QuadtreeConfig(min_size=4, max_size=16)),
    ("full", QuadtreeConfig(min_size=4, max_size=16, mask_covered=False)),
]:
    r = encode_plane_quadtree(p, cfg, qcfg)
    np.asarray(r.levels[-1].domain_idx)  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = encode_plane_quadtree(p, cfg, qcfg)
        np.asarray(r.levels[-1].domain_idx)
        times.append(time.perf_counter() - t0)
    leaves = [int(np.asarray(l.accepted).sum()) for l in r.levels]
    print(f"{label}: {min(times)*1e3:.2f} ms leaves={leaves}")
