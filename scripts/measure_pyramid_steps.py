"""PSNR as a function of full-res steps after the pyramid init (and flat),
to size DecoderConfig.pyramid_full_steps honestly."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fractencode_tpu import DecoderConfig, EncoderConfig, encode_plane
from fractencode_tpu.codec import pack_result, unpack_result
from fractencode_tpu.decode.decoder import (
    _build_indices,
    _decode_step,
    _pyramid_init,
)
from fractencode_tpu.image import load_gray

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256

plane = np.asarray(load_gray("/root/reference/tests/input/lenna512x512.png"))
reps = -(-SIZE // plane.shape[0])
plane = np.tile(plane, (reps, reps))[:SIZE, :SIZE]

res_raw = encode_plane(plane, EncoderConfig())
res_q = unpack_result(pack_result(res_raw, plane=plane))


def psnr(img):
    err = ((np.asarray(img).astype(np.float64) - plane.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / max(err, 1e-9))


for name, res in (("raw", res_raw), ("quantized", res_q)):
    dcfg = DecoderConfig()
    idx = _build_indices(res)
    s = jnp.where(res.valid, res.s, 0.0)
    o = jnp.where(res.valid, res.o, 0.0)
    h, w = res.height, res.width
    step = jax.jit(lambda im: _decode_step(im, idx, s, o, h, w,
                                           res.target_size, res.o_is_mean))
    for init_name, img in (
        ("flat", jnp.full((h, w), 100, jnp.uint8)),
        ("pyr", _pyramid_init(res, s, o, dcfg)),
    ):
        vals = []
        for k in range(16):
            vals.append(f"{psnr(img):.2f}")
            img = step(img)
        print(f"{name:10s} {init_name:5s}: " + " ".join(vals))
