"""Device-trace the fused 1024^2 quadtree encode; print top XLA ops."""
import glob
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from fractencode_tpu import EncoderConfig
from fractencode_tpu.encode.quadtree import QuadtreeConfig, encode_plane_quadtree
from fractencode_tpu.image import load_gray

plane = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
plane = np.tile(plane, (2, 2))[:1024, :1024]
p = jnp.asarray(plane)
jnp.add(p, 0).block_until_ready()

cfg = EncoderConfig()
qcfg = QuadtreeConfig(min_size=4, max_size=16)
r = encode_plane_quadtree(p, cfg, qcfg)
np.asarray(r.levels[-1].domain_idx)  # warm

tdir = "/tmp/qt_trace"
with jax.profiler.trace(tdir):
    r = encode_plane_quadtree(p, cfg, qcfg)
    np.asarray(r.levels[-1].domain_idx)

from jax.profiler import ProfileData
pd = ProfileData.from_file(sorted(glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True))[-1])
rows = []
for plane_ in pd.planes:
    for line in plane_.lines:
        if "XLA Ops" in line.name and "Async" not in line.name:
            for ev in line.events:
                rows.append((ev.duration_ns / 1e6, ev.name))
rows.sort(reverse=True)
total = sum(d for d, _ in rows)
print(f"total device op time: {total:.2f} ms over {len(rows)} events")
agg = {}
for d, n in rows:
    key = n.split(".")[0][:60]
    agg[key] = agg.get(key, 0.0) + d
for k, v in sorted(agg.items(), key=lambda x: -x[1])[:25]:
    print(f"{v:8.3f} ms  {k}")
