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
    """Exact integer MSE between two same-shape u8 planes, as f64-safe f32.

    Mirrors the same-size path of ``RootMeanSquare::distance``
    (``metrics.h:26-36``): integer accumulation of squared differences,
    normalized by the plane area.
    """
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    total = jnp.sum(d * d)
    return total.astype(jnp.float64 if jnp.float64 == total.dtype else jnp.float32) / a.size


def psnr(a: jnp.ndarray, b: jnp.ndarray, peak: float = 255.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB between two u8 planes."""
    mse = plane_mse(a, b)
    mse = jnp.maximum(mse, 1e-12)
    return 10.0 * jnp.log10(peak * peak / mse)
