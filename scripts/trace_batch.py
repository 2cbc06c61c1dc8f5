"""Capture a device trace of the batch-16 512^2 encode; summarize op costs."""
import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fractencode_tpu import EncoderConfig
from fractencode_tpu.encode import encode_batch
from fractencode_tpu.image import load_gray

plane = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
cfg = EncoderConfig()
batch = jnp.asarray(np.stack([plane] * 16))
jnp.add(batch, 0).block_until_ready()
outs = encode_batch(batch, cfg)
np.asarray(outs[-1].s)

d = "/tmp/trace_batch"
with jax.profiler.trace(d):
    outs = encode_batch(batch, cfg)
    np.asarray(outs[-1].s)

from jax.profiler import ProfileData

pd = ProfileData.from_file(
    sorted(glob.glob(f"{d}/**/*.xplane.pb", recursive=True))[-1])
rows = []
for plane_ in pd.planes:
    for line in plane_.lines:
        if "XLA Ops" not in line.name and "xla ops" not in line.name.lower():
            continue
        for ev in line.events:
            rows.append((ev.name, ev.duration_ns))
import collections

agg = collections.Counter()
cnt = collections.Counter()
for name, dur in rows:
    key = name.split(".")[0][:60]
    agg[key] += dur
    cnt[key] += 1
total = sum(agg.values())
print(f"total device op time: {total/1e6:.2f} ms over {len(rows)} events")
for name, dur in agg.most_common(25):
    print(f"{dur/1e6:9.3f} ms  x{cnt[name]:5d}  {name}")
