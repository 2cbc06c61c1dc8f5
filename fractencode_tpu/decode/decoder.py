"""Fixed-point PIFS decoder, fully on-device.

Reference semantics (``/root/reference/encode/Encoder2.hpp:60-99``,
``encode/DecodeUtils.hpp:9-25``): start from a flat gray-100 image and
iterate the contractive map set (Jacobi style — every step reads the previous
full image) until the inter-iterate MSE drops below epsilon (default 1e-5) or
300 iterations.  Per range pixel: bilinear-sample the isometry-mapped domain,
apply ``s*v + o``, clamp to [0, 255] and *truncate* to u8
(``DecodeUtils.hpp:23`` uses a static_cast, not a round).

TPU-native design: because ranges tile the image exactly, one decode step is
a single batched gather (4 taps per output pixel through precomputed
isometry/stride tables) + VPU affine/clamp + a reshape — no scatter needed.
The convergence loop is a ``lax.while_loop`` so the whole decode stays on
device; u8 image state keeps HBM traffic minimal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sampler import all_tap_tables
from ..core.transform import NUM_TRANSFORMS
from ..encode.encoder import EncodeResult
from ..params import DecoderConfig

__all__ = ["decode_plane", "decode_steps_py"]


@functools.lru_cache(maxsize=None)
def _global_tap_tables(source_size: int, target_size: int, stride: int) -> np.ndarray:
    """[NUM_TRANSFORMS, K, 4] flat *image* offsets of the 4 sample taps for
    every output pixel of a domain block anchored at flat origin 0."""
    local = all_tap_tables(source_size, target_size)  # block-flat, stride=sw
    my, mx = np.divmod(local, source_size)
    return (my.astype(np.int64) * stride + mx).astype(np.int32)


def _build_indices(result: EncodeResult):
    """[R, K, 4] i32 flat gather indices into the image for one decode step."""
    w = result.width
    taps = jnp.asarray(
        _global_tap_tables(result.source_size, result.target_size, w)
    )  # [8, K, 4]
    ox, oy = result.domain_origins()
    origin_flat = oy.astype(jnp.int32) * w + ox.astype(jnp.int32)  # [R]
    taps_r = taps[result.transform]  # [R, K, 4]
    return origin_flat[:, None, None] + taps_r


def _decode_step(img_u8, idx, s, o, height, width, target_size, o_is_mean=False):
    """One application of the full map set: u8 image -> u8 image."""
    flat = img_u8.astype(jnp.float32).reshape(-1)
    samp = flat[idx].sum(axis=-1) * 0.25  # [R, K]
    if o_is_mean:
        samp = samp - samp.mean(axis=-1, keepdims=True)
    out = s[:, None] * samp + o[:, None]
    out = jnp.floor(jnp.clip(out, 0.0, 255.0)).astype(jnp.uint8)
    ny = height // target_size
    nx = width // target_size
    return (
        out.reshape(ny, nx, target_size, target_size)
        .transpose(0, 2, 1, 3)
        .reshape(height, width)
    )


@functools.partial(jax.jit, static_argnames=("dcfg",))
def decode_plane(result: EncodeResult, dcfg: DecoderConfig = DecoderConfig()):
    """Decode to a fixed point. Returns (plane u8 [H, W], iterations, mse).

    ``iterations`` follows the reference's count (loop index at exit:
    ``Encoder2.hpp:76-88``).
    """
    h, w = result.height, result.width
    idx = _build_indices(result)
    s = jnp.where(result.valid, result.s, 0.0)
    o = jnp.where(result.valid, result.o, 0.0)
    step = lambda img: _decode_step(
        img, idx, s, o, h, w, result.target_size, result.o_is_mean
    )

    init = jnp.full((h, w), dcfg.initial_value, dtype=jnp.uint8)

    def cond(carry):
        img, steps, mse, done = carry
        return (steps < dcfg.max_iterations) & ~done

    def body(carry):
        img, steps, _, _ = carry
        nxt = step(img)
        d = nxt.astype(jnp.float32) - img.astype(jnp.float32)
        mse = jnp.sum(d * d) / (h * w)
        return nxt, steps + 1, mse, mse < dcfg.epsilon

    img, steps, mse, done = jax.lax.while_loop(
        cond, body, (init, jnp.int32(0), jnp.float32(jnp.inf), jnp.bool_(False))
    )
    iterations = jnp.where(done, steps - 1, steps)
    return img, iterations, mse


def decode_steps_py(result: EncodeResult, dcfg: DecoderConfig = DecoderConfig()):
    """Python-loop decode yielding every iterate (for --debug_decode dumps,
    cf. ``Encoder2.hpp:74-82``). Yields (step_index, u8 image)."""
    h, w = result.height, result.width
    idx = _build_indices(result)
    s = jnp.where(result.valid, result.s, 0.0)
    o = jnp.where(result.valid, result.o, 0.0)
    step = jax.jit(
        lambda img: _decode_step(
            img, idx, s, o, h, w, result.target_size, result.o_is_mean
        )
    )
    img = jnp.full((h, w), dcfg.initial_value, dtype=jnp.uint8)
    yield 0, img
    for i in range(dcfg.max_iterations):
        nxt = step(img)
        d = np.asarray(nxt, dtype=np.float32) - np.asarray(img, dtype=np.float32)
        mse = float((d * d).sum()) / (h * w)
        yield i + 1, nxt
        if mse < dcfg.epsilon:
            return
        img = nxt
