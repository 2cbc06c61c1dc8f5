"""Benchmark runner.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: encode throughput (megapixels/s) on the 512x512 grayscale
Lenna default search (16x16 domains step 8, 4x4 ranges, 4 isometries,
classifier on) — the reference C++ encoder measured on this same machine
(2 cores, -O3 -mavx2, patched only to fix its condvar deadlock and disable
FMA contraction) takes 7.545 s for the identical search
=> 0.0347 Mpix/s baseline.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_CPP_SECONDS_512 = 7.545  # /tmp measurement, see BASELINE.md
LENNA = "/root/reference/tests/input/lenna512x512.png"


def load_plane():
    if os.path.exists(LENNA):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from fractencode_tpu.image import load_gray

        return np.asarray(load_gray(LENNA))
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(512, 512), dtype=np.uint8)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    from fractencode_tpu import EncoderConfig, decode_plane, encode_plane

    plane = load_plane()
    h, w = plane.shape
    cfg = EncoderConfig()  # default: affine criterion, 4 transforms, classifier

    # warmup / compile
    res = encode_plane(plane, cfg)
    np.asarray(res.domain_idx)

    # NOTE: timing pulls a result array to host — on remote-attached devices
    # block_until_ready can return before execution finishes, so a transfer
    # is the only honest completion barrier.
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = encode_plane(plane, cfg)
        np.asarray(res.domain_idx)
        np.asarray(res.s)
        times.append(time.perf_counter() - t0)
    encode_s = min(times)

    out, iters, mse = decode_plane(res)
    out.block_until_ready()

    mpix_s = (h * w) / encode_s / 1e6
    baseline_mpix_s = (h * w) / BASELINE_CPP_SECONDS_512 / 1e6
    print(
        json.dumps(
            {
                "metric": "encode_throughput_512px_lenna",
                "value": round(mpix_s, 4),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / baseline_mpix_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
