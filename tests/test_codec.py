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

def test_container_roundtrip_and_validation():
    from fractencode_tpu.codec.container import (
        is_container,
        pack_container,
        unpack_container,
    )

    planes = [b"FTC1" + bytes(range(50)), b"FTC1" + bytes(20), b"FTQ1" + bytes(7)]
    blob = pack_container(planes)
    assert is_container(blob)
    assert unpack_container(blob) == planes
    one = pack_container(planes[:1])
    assert unpack_container(one) == planes[:1]

    import pytest

    with pytest.raises(ValueError):
        pack_container(planes[:2])  # only 1 or 3 planes
    with pytest.raises(ValueError, match="length table"):
        unpack_container(blob[:-3])  # truncated payload
    with pytest.raises(ValueError, match="length table"):
        unpack_container(blob + b"x")  # trailing garbage
    with pytest.raises(ValueError):
        unpack_container(b"FTCC\x01\x00")  # truncated before plane count
    with pytest.raises(ValueError, match="not a container"):
        unpack_container(b"NOPE" + bytes(20))


def test_entropy_stream_fuzz(rng):
    """Canonical-Huffman stream round trip across distribution shapes; the
    native C++ decoder (when built) and the numpy oracle must agree."""
    from fractencode_tpu.codec.entropy import (
        _decode_payload_py,
        decode_stream,
        encode_stream,
    )

    cases = [
        np.array([], np.uint8),
        np.full(500, 9, np.uint8),
        rng.integers(0, 256, 4000).astype(np.uint8),
        rng.choice(8, 20000, p=[.5, .2, .1, .08, .05, .04, .02, .01]).astype(np.uint8),
        np.clip(rng.normal(128, 2, 50000), 0, 255).astype(np.uint8),
    ]
    import struct

    from fractencode_tpu.codec.entropy import _unpack_lengths

    for c in cases:
        blob = encode_stream(c)
        out, off = decode_stream(blob)
        assert off == len(blob)
        np.testing.assert_array_equal(out, c)
        if blob[0] == 1:  # huffman mode: numpy oracle must agree too
            n, n_bits = struct.unpack_from("<II", blob, 1)
            lengths, off = _unpack_lengths(blob, 9)
            oracle = _decode_payload_py(blob[off:], n_bits, n, lengths)
            np.testing.assert_array_equal(oracle, c)
    for _ in range(20):
        n = int(rng.integers(0, 2000))
        c = rng.integers(0, int(rng.integers(1, 257)), n).astype(np.uint8)
        out, _ = decode_stream(encode_stream(c))
        np.testing.assert_array_equal(out, c)


def test_entropy_truncation_fails_loudly(rng):
    from fractencode_tpu.codec.entropy import decode_stream, encode_stream

    c = np.clip(rng.normal(100, 20, 5000), 0, 255).astype(np.uint8)
    blob = encode_stream(c)
    assert blob[0] in (1, 2)  # a coded mode engaged (huffman or range)
    import pytest

    with pytest.raises(ValueError):
        decode_stream(blob[: len(blob) // 2])


def test_range_coder_roundtrip_and_oracle(rng):
    """Mode-2 adaptive range coder: the C++ fast path must match the
    python oracle bit-for-bit in both directions, across alphabet widths
    and distribution shapes; truncation fails loudly."""
    import pytest

    from fractencode_tpu.codec.entropy import (
        _rc_decode_py,
        _rc_encode_py,
        decode_uint_stream,
        encode_uint_stream,
    )
    from fractencode_tpu.codec.native import rc_decode_native, rc_encode_native

    cases = [
        (8, rng.integers(0, 256, 3000)),
        (12, rng.integers(0, 4096, 4000)),
        (12, (rng.integers(0, 8, 4000) * 512 + rng.integers(0, 4, 4000))),
        (5, rng.integers(0, 32, 200)),
        (20, rng.integers(0, 1 << 20, 500)),
        (3, np.zeros(100)),
    ]
    for nbits, vals in cases:
        vals = vals.astype(np.uint32)
        e_py = _rc_encode_py(vals, nbits)
        e_na = rc_encode_native(vals, nbits)
        if e_na is not None:  # no-compiler environments skip the parity leg
            assert e_na == e_py, (nbits, len(vals))
            na = rc_decode_native(e_py, nbits, len(vals))
            np.testing.assert_array_equal(na, vals)
        np.testing.assert_array_equal(_rc_decode_py(e_py, nbits, len(vals)),
                                      vals)
        blob = encode_uint_stream(vals, nbits)
        out, off = decode_uint_stream(blob, 0, expect_count=len(vals),
                                      expect_nbits=nbits)
        assert off == len(blob)
        np.testing.assert_array_equal(out, vals)
        for cut in (10, len(blob) // 2, len(blob) - 2):
            with pytest.raises(ValueError):
                decode_uint_stream(blob[:cut], 0, expect_count=len(vals))


def test_bitstream_entropy_identical_decode(lenna_y):
    """Entropy-coded FTC1 payload (flat short-circuit off): smaller file,
    bit-identical fields and decode (the rate axis of the north star at
    unchanged PSNR)."""
    img = np.asarray(lenna_y)[128:256, 128:256]
    res = encode_plane(img, EncoderConfig())
    raw = pack_result(res, plane=img, entropy=False)
    ent = pack_result(res, plane=img, flat_scale=0.0)
    assert len(ent) < len(raw), (len(ent), len(raw))
    r0, r1 = unpack_result(raw), unpack_result(ent)
    for f in ("domain_idx", "transform", "s", "o", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(r0, f)), np.asarray(getattr(r1, f)))
    out0, _, _ = decode_plane(r0)
    out1, _, _ = decode_plane(r1)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))


def test_bitstream_flat_short_circuit(lenna_y):
    """Flat short-circuit (the default): smaller again than plain entropy,
    flat items decode with s == 0 exactly, non-flat fields bit-identical,
    and the decoded PSNR stays within the flat-threshold's error-neutrality
    envelope of the no-flat stream."""
    from fractencode_tpu.codec.bitstream import _FLAG_FLAT_SC, _HDR_FMT
    import struct

    from fractencode_tpu.core.metrics import psnr

    img = np.asarray(lenna_y)[:256, :256]
    res = encode_plane(img, EncoderConfig())
    ent = pack_result(res, plane=img, flat_scale=0.0)
    flat = pack_result(res, plane=img)
    assert len(flat) < len(ent), (len(flat), len(ent))
    flags = struct.unpack(_HDR_FMT, flat[: struct.calcsize(_HDR_FMT)])[2]
    assert flags & _FLAG_FLAT_SC
    r0, r1 = unpack_result(ent), unpack_result(flat)
    s0 = np.asarray(r0.s)
    s1 = np.asarray(r1.s)
    is_flat = s1 == 0.0
    assert is_flat.any()
    # non-flat items are untouched
    for f in ("domain_idx", "transform", "s", "o"):
        np.testing.assert_array_equal(
            np.asarray(getattr(r0, f))[~is_flat],
            np.asarray(getattr(r1, f))[~is_flat])
    # flat items really had tiny s (within the threshold's neutrality bound)
    lo, hi = np.percentile(np.asarray(res.s), [0.5, 99.5])
    bucket = (hi - lo) / 32
    assert np.abs(np.asarray(res.s))[is_flat].max() <= 0.35 * bucket + 1e-9
    out0, _, _ = decode_plane(r0)
    out1, _, _ = decode_plane(r1)
    p0 = float(psnr(img, np.asarray(out0)))
    p1 = float(psnr(img, np.asarray(out1)))
    assert p1 > p0 - 0.05, (p1, p0)


def test_quadtree_bitstream_entropy_identical(lenna_y):
    from fractencode_tpu.codec.bitstream_quadtree import (
        pack_quadtree,
        unpack_quadtree,
    )
    from fractencode_tpu.encode.quadtree import (
        QuadtreeConfig,
        encode_plane_quadtree,
    )

    img = np.asarray(lenna_y)[128:256, 128:256]
    qres = encode_plane_quadtree(img, EncoderConfig(), QuadtreeConfig())
    raw = pack_quadtree(qres, plane=img, entropy=False)
    ent = pack_quadtree(qres, plane=img, flat_scale=0.0)
    assert len(ent) <= len(raw)
    r0, r1 = unpack_quadtree(raw), unpack_quadtree(ent)
    for l0, l1 in zip(r0.levels, r1.levels):
        for f in ("domain_idx", "transform", "s", "o", "accepted"):
            np.testing.assert_array_equal(
                np.asarray(getattr(l0, f)), np.asarray(getattr(l1, f)))
    # the flat-short-circuit default is smaller still, with identical
    # acceptance maps (implied-map coding is a pure bijection) and s == 0
    # exactly on its flat leaves
    flat = pack_quadtree(qres, plane=img)
    assert len(flat) <= len(ent)
    r2 = unpack_quadtree(flat)
    for l1, l2 in zip(r1.levels, r2.levels):
        np.testing.assert_array_equal(np.asarray(l1.accepted),
                                      np.asarray(l2.accepted))
        s2 = np.asarray(l2.s)
        keep = s2 != 0.0
        np.testing.assert_array_equal(np.asarray(l1.domain_idx)[keep],
                                      np.asarray(l2.domain_idx)[keep])


def test_bitstream_corruption_fuzz(lenna_y, rng):
    """Corruptions of an entropy-coded stream must either raise ValueError
    (loud failure) or decode to a well-shaped result — never crash, hang,
    or allocate absurd arrays (a corrupted stream count field must not
    become np.empty(4e9))."""
    import struct

    from fractencode_tpu.codec.bitstream import _FLAG_ENTROPY, _HDR_FMT

    img = np.asarray(lenna_y)[128:256, 128:256]
    res = encode_plane(img, EncoderConfig())
    blob = bytearray(pack_result(res, plane=img))
    flags = struct.unpack(_HDR_FMT, bytes(blob[: struct.calcsize(_HDR_FMT)]))[2]
    assert flags & _FLAG_ENTROPY, "fixture must exercise the entropy payload"
    n = res.num_ranges
    hdr = struct.calcsize(_HDR_FMT)

    def try_decode(b):
        try:
            r = unpack_result(bytes(b))
            assert r.domain_idx.shape == (n,)
            return "ok"
        except (ValueError, AssertionError, IndexError, struct.error):
            return "rejected"

    # a corrupted stream count field fails loudly (first stream's count
    # starts right after the header: u8 mode | u32 count)
    evil = bytearray(blob)
    struct.pack_into("<I", evil, hdr + 1, 0xFFFFFFFF)
    assert try_decode(evil) == "rejected"
    # truncations at every region fail loudly
    for cut in (hdr - 4, hdr + 3, len(blob) // 2, len(blob) - 3):
        assert try_decode(blob[:cut]) == "rejected"
    # random payload flips: either outcome, but never a crash/mis-shape
    outcomes = set()
    for _ in range(80):
        pos = int(rng.integers(hdr, len(blob)))
        old = blob[pos]
        blob[pos] = old ^ int(rng.integers(1, 256))
        outcomes.add(try_decode(blob))
        blob[pos] = old
    assert outcomes <= {"ok", "rejected"} and "rejected" in outcomes


def test_quadtree_corruption_fuzz(lenna_y, rng):
    """FTQ1 v5 corruption robustness: the implied acceptance maps, flat
    short-circuit and range-coded streams all interact here — corruptions
    must raise ValueError (loud) or decode to a well-shaped result, never
    crash, hang, or divide by zero."""
    import struct

    from fractencode_tpu.codec.bitstream_quadtree import (
        _HDR_FMT,
        pack_quadtree,
        unpack_quadtree,
    )
    from fractencode_tpu.encode.quadtree import (
        QuadtreeConfig,
        encode_plane_quadtree,
    )

    img = np.asarray(lenna_y)[128:256, 128:256]
    qres = encode_plane_quadtree(img, EncoderConfig(), QuadtreeConfig())
    blob = bytearray(pack_quadtree(qres, plane=img))
    hdr = struct.calcsize(_HDR_FMT)
    n_levels = len(qres.levels)

    def try_decode(b):
        try:
            r = unpack_quadtree(bytes(b))
            assert len(r.levels) == n_levels
            return "ok"
        except (ValueError, AssertionError, IndexError, struct.error):
            return "rejected"

    # truncations at every region fail loudly
    for cut in (hdr - 2, hdr + 3, len(blob) // 3, len(blob) // 2,
                len(blob) - 2):
        assert try_decode(blob[:cut]) == "rejected", cut
    # zeroed level geometry (range_size = 0) must not divide by zero
    evil = bytearray(blob)
    struct.pack_into("<H", evil, hdr, 0)
    assert try_decode(evil) == "rejected"
    # random flips anywhere: either outcome, never a crash
    outcomes = set()
    for _ in range(120):
        pos = int(rng.integers(0, len(blob)))
        old = blob[pos]
        blob[pos] = old ^ int(rng.integers(1, 256))
        outcomes.add(try_decode(blob))
        blob[pos] = old
    assert outcomes <= {"ok", "rejected"} and "rejected" in outcomes
