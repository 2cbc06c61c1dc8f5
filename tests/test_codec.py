"""Quantizer + bitstream round-trip tests."""
import numpy as np

from fractencode_tpu import EncoderConfig, decode_plane, encode_plane
from fractencode_tpu.codec import pack_result, unpack_result
from fractencode_tpu.codec.quantize import dequantize, quantize


def test_quantizer_semantics():
    """Port of Quantizer.hpp semantics: floor into buckets, midpoint decode."""
    vals = np.array([0.0, 0.49, 0.5, 0.99, 1.0])
    q = quantize(vals, 0.0, 1.0, 2)  # 4 buckets, step 0.25
    assert q.tolist() == [0, 1, 2, 3, 3]  # 1.0 clamps into top bucket
    d = dequantize(q, 0.0, 1.0, 2)
    np.testing.assert_allclose(d, [0.125, 0.375, 0.625, 0.875, 0.875])


def test_quantizer_roundtrip_error_bound(rng):
    vals = rng.uniform(-2.0, 3.0, size=1000)
    bits = 7
    q = quantize(vals, vals.min(), vals.max(), bits)
    d = dequantize(q, vals.min(), vals.max(), bits)
    step = (vals.max() - vals.min()) / (1 << bits)
    assert np.abs(d - vals).max() <= step / 2 + 1e-9


def test_bitstream_roundtrip(rng):
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    res = encode_plane(img, EncoderConfig())
    blob = pack_result(res)
    back = unpack_result(blob)
    assert back.width == 64 and back.height == 64
    assert back.source_size == 16 and back.target_size == 4
    np.testing.assert_array_equal(np.asarray(back.domain_idx), np.asarray(res.domain_idx))
    np.testing.assert_array_equal(np.asarray(back.transform), np.asarray(res.transform))
    np.testing.assert_array_equal(np.asarray(back.valid), np.asarray(res.valid))
    # s survives within a quantizer step inside the robust (percentile-
    # clipped) range; outliers saturate by design
    s = np.asarray(res.s)
    lo, hi = np.percentile(s, [0.5, 99.5])
    s_step = (hi - lo) / 32
    inside = (s >= lo) & (s <= hi)
    assert inside.mean() > 0.9
    assert np.abs(np.asarray(back.s) - s)[inside].max() <= s_step / 2 + 1e-6


def test_bitstream_decode_quality(lenna_y):
    """Decode from the quantized bitstream loses little quality
    (BASELINE config 2: quantized s/o).  The mean-centred parameterization
    (pack with plane=) must land within ~2.5 dB of the unquantized decode at
    the reference's 5/7-bit budget."""
    from fractencode_tpu.core.metrics import psnr

    img = np.asarray(lenna_y)[:128, :128]
    res = encode_plane(img, EncoderConfig())
    out_full, _, _ = decode_plane(res)
    out_q, _, _ = decode_plane(unpack_result(pack_result(res, plane=img)))
    p_full = float(psnr(img, np.asarray(out_full)))
    p_q = float(psnr(img, np.asarray(out_q)))
    assert p_q > p_full - 2.5, (p_q, p_full)
    # plain (s, o) quantization is markedly worse — documents why smean exists
    out_so, _, _ = decode_plane(unpack_result(pack_result(res)))
    p_so = float(psnr(img, np.asarray(out_so)))
    assert p_q > p_so, (p_q, p_so)


def test_bitstream_size(rng):
    img = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)
    res = encode_plane(img, EncoderConfig())
    blob = pack_result(res)
    # 1024 items * (1 + 9 + 3 + 5 + 7 bits = 25 bits) / 8 + header
    assert len(blob) < 1024 * 4 + 64
    # compression vs raw 8bpp
    assert len(blob) < 128 * 128