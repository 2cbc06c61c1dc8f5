"""Distance metrics.

Parity notes (``/root/reference/image/metrics.h``):
  * despite the class name ``RootMeanSquare``, the reference computes **MSE —
    no square root** (``metrics.h:36,49``); all thresholds (encoder
    ``rmsThreshold``, decoder epsilon) are therefore in MSE units;
  * the per-pair search distance normalizes by the **domain** (sliceA) area
    even though the sum runs over range pixels only (``metrics.h:49``) — that
    scaling lives in the matcher (see ``encode/matcher.py``); the whole-image
    overload used for decoder convergence has equal areas so the quirk
    vanishes (``metrics.h:53-56``).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["plane_mse", "psnr"]


def plane_mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact integer MSE between two same-shape u8 planes, as f32.

    Mirrors the same-size path of ``RootMeanSquare::distance``
    (``metrics.h:26-36``): integer accumulation of squared differences,
    normalized by the plane area. The reference accumulates into a double
    (``metrics.h:53-56``); with jax's default x64-disabled config a flat i32
    sum would wrap at ~2^31 (worst case 255^2 * N exceeds that from ~182k
    pixels), so accumulate chunkwise: exact i32 partial sums of 4096-pixel
    chunks (max 4096 * 65025 < 2^31), then split each partial into hi/lo
    halves around bit 15 so both column sums stay exact in i32 up to
    16384 x 16384 worst-case planes, and recombine in f32 at the end.
    """
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    d2 = (d * d).reshape(-1)
    chunk = 4096
    pad = (-d2.size) % chunk
    if pad:
        d2 = jnp.pad(d2, (0, pad))
    part = jnp.sum(d2.reshape(-1, chunk), axis=1)  # exact: <= 4096 * 255^2 < 2^31
    hi = jnp.sum(part >> 15)            # <= 65536 chunks * (2^31 >> 15) < 2^31
    lo = jnp.sum(part & 0x7FFF)         # <= 65536 chunks * 32767 < 2^31
    n = float(a.size)
    return hi.astype(jnp.float32) * (32768.0 / n) + lo.astype(jnp.float32) / n


def psnr(a: jnp.ndarray, b: jnp.ndarray, peak: float = 255.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB between two u8 planes."""
    mse = plane_mse(a, b)
    mse = jnp.maximum(mse, 1e-12)
    return 10.0 * jnp.log10(peak * peak / mse)
