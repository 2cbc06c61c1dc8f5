"""Static canonical-Huffman entropy layer for the bitstreams.

The reference never serialized anything (``/root/reference/main.cpp:106-140``
stops at bucket statistics); rounds 1-3 of this framework packed fixed-width
fields.  This module supplies the rate half of rate-distortion: per-field
byte streams (domain-index byte planes, transform, s_q, zigzag-delta o_q)
each get a static canonical Huffman code built from the stream's own
histogram.  Measured symbol entropies on the Lenna fixtures (see
docs/PERF_NOTES.md round 4): transform ~2.0 bits, s_q ~3.6, delta-o_q ~5.1
vs their 3/5/7-bit fixed widths; domain indices are near-incompressible
(winners are spatially uncorrelated — delta coding *hurts*: H(delta) >
H(raw)), so they stay raw-valued and only their byte planes get coded.

Stream framing (little-endian):

    u8 mode | u32 count
    mode 0 (raw):     count bytes follow
    mode 1 (huffman): u32 n_bits | u16 alphabet size | packed 4-bit code
                      lengths (ceil(alphabet/2) bytes) | payload

Mode 0 is chosen whenever the coded size would not beat raw (tiny streams,
uniform histograms), so entropy coding never loses.  Code lengths are capped
at 15 bits (JPEG-style adjustment) and the canonical reconstruction on the
decode side depends only on the length table.

The numpy implementation is the oracle; the C++ fast path for the
symbol-serial decode loop is ``ftc_huffman_decode`` in
``native/bitpack.cpp`` (loaded via ``codec/native.py``).
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_stream", "decode_stream", "zigzag", "unzigzag",
    "huffman_lengths", "canonical_codes",
    "encode_uint_stream", "decode_uint_stream",
]

_MAX_LEN = 15

# --- adaptive binary range coder (stream mode 2) -------------------------
# LZMA-style bit-tree coder: 11-bit adaptive probabilities, shift-5 update,
# 32-bit range, byte renormalization with carry cache.  Table-free (the
# model adapts to the stream), and a JOINT alphabet for multi-byte fields
# recovers the correlation a byte-planar split loses (measured ~0.7
# bits/item on the domain index).  This python implementation is the
# ORACLE; the C++ fast path in native/bitpack.cpp must match bit-for-bit.
_RC_PROB_BITS = 11
_RC_PROB_INIT = 1 << (_RC_PROB_BITS - 1)
_RC_MOVE = 5
_RC_TOP = 1 << 24
_RC_MAX_NBITS = 20


def _rc_encode_py(vals, nbits: int) -> bytes:
    probs = [_RC_PROB_INIT] * (1 << nbits)
    out = bytearray()
    low = 0
    rng = 0xFFFFFFFF
    cache = 0
    cache_size = 1

    def shift_low():
        nonlocal low, cache, cache_size
        if (low & 0xFFFFFFFF) < 0xFF000000 or low >> 32:
            carry = low >> 32
            temp = cache
            while True:
                out.append((temp + carry) & 0xFF)
                temp = 0xFF
                cache_size -= 1
                if cache_size == 0:
                    break
            cache = (low >> 24) & 0xFF
        cache_size += 1
        low = (low << 8) & 0xFFFFFFFF

    for v in vals:
        v = int(v)
        m = 1
        for b in range(nbits - 1, -1, -1):
            bit = (v >> b) & 1
            p = probs[m]
            bound = (rng >> _RC_PROB_BITS) * p
            if not bit:
                rng = bound
                probs[m] = p + (((1 << _RC_PROB_BITS) - p) >> _RC_MOVE)
            else:
                low += bound
                rng -= bound
                probs[m] = p - (p >> _RC_MOVE)
            m = (m << 1) | bit
            while rng < _RC_TOP:
                rng = (rng << 8) & 0xFFFFFFFF
                shift_low()
    for _ in range(5):
        shift_low()
    return bytes(out)


def _rc_decode_py(payload: bytes, nbits: int, n: int) -> np.ndarray:
    probs = [_RC_PROB_INIT] * (1 << nbits)
    pos = 0
    plen = len(payload)
    underrun = False

    def read_byte():
        nonlocal pos, underrun
        if pos < plen:
            b = payload[pos]
            pos += 1
            return b
        underrun = True
        return 0

    rng = 0xFFFFFFFF
    read_byte()
    code = 0
    for _ in range(4):
        code = ((code << 8) | read_byte()) & 0xFFFFFFFF
    out = np.empty(n, np.uint32)
    top = 1 << nbits
    for i in range(n):
        m = 1
        for _ in range(nbits):
            p = probs[m]
            bound = (rng >> _RC_PROB_BITS) * p
            if code < bound:
                bit = 0
                rng = bound
                probs[m] = p + (((1 << _RC_PROB_BITS) - p) >> _RC_MOVE)
            else:
                bit = 1
                code -= bound
                rng -= bound
                probs[m] = p - (p >> _RC_MOVE)
            m = (m << 1) | bit
            while rng < _RC_TOP:
                rng = (rng << 8) & 0xFFFFFFFF
                code = ((code << 8) | read_byte()) & 0xFFFFFFFF
        out[i] = m - top
        if underrun:
            raise ValueError("corrupt range-coded payload (truncated)")
    return out


def zigzag(d: np.ndarray) -> np.ndarray:
    """Signed deltas -> small unsigned (0, -1, 1, -2, ... -> 0, 1, 2, 3)."""
    d = d.astype(np.int64)
    return np.where(d >= 0, 2 * d, -2 * d - 1).astype(np.uint32)


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.int64)
    return np.where(u & 1, -(u + 1) // 2, u // 2)


def huffman_lengths(counts: np.ndarray, max_len: int = _MAX_LEN) -> np.ndarray:
    """[256] symbol counts -> [256] u8 code lengths (0 = absent symbol).

    Standard two-queue Huffman over the present symbols, then the JPEG
    Annex K length-limiting adjustment when any code exceeds ``max_len``.
    """
    counts = np.asarray(counts, np.int64)
    present = np.where(counts > 0)[0]
    lengths = np.zeros(256, np.uint8)
    if len(present) == 0:
        return lengths
    if len(present) == 1:
        lengths[present[0]] = 1
        return lengths

    # Huffman via sorted merge (O(n log n) once, then two-queue O(n)).
    order = present[np.argsort(counts[present], kind="stable")]
    leaf_w = counts[order].tolist()
    # nodes: (weight, [symbol indices under this node])
    import collections

    leaves = collections.deque((w, [s]) for w, s in zip(leaf_w, order.tolist()))
    merged = collections.deque()
    depth = np.zeros(256, np.int64)

    def pop_min():
        if not merged or (leaves and leaves[0][0] <= merged[0][0]):
            return leaves.popleft()
        return merged.popleft()

    while len(leaves) + len(merged) > 1:
        w1, s1 = pop_min()
        w2, s2 = pop_min()
        for s in s1:
            depth[s] += 1
        for s in s2:
            depth[s] += 1
        merged.append((w1 + w2, s1 + s2))

    if depth.max() > max_len:
        # JPEG-style: count codes per length, fold overlong codes down.
        bl = np.bincount(depth[present], minlength=depth.max() + 1)
        bl = bl.astype(np.int64)
        i = len(bl) - 1
        while i > max_len:
            while bl[i] > 0:
                j = i - 2
                while bl[j] == 0:
                    j -= 1
                bl[i] -= 2
                bl[i - 1] += 1
                bl[j + 1] += 2
                bl[j] -= 1
            i -= 1
        # reassign: longest-first over symbols sorted by ascending count
        # (rarest symbols get the longest codes)
        new_depth = np.zeros(256, np.int64)
        syms = present[np.argsort(counts[present], kind="stable")]  # rare first
        li = max_len
        k = 0
        for li in range(max_len, 0, -1):
            for _ in range(int(bl[li]) if li < len(bl) else 0):
                new_depth[syms[k]] = li
                k += 1
        depth = new_depth

    lengths[present] = depth[present].astype(np.uint8)
    return lengths


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """[256] lengths -> [256] u16 canonical codes (MSB-first semantics)."""
    codes = np.zeros(256, np.uint16)
    code = 0
    for l in range(1, _MAX_LEN + 1):
        for s in np.where(lengths == l)[0]:
            codes[s] = code
            code += 1
        code <<= 1
    return codes


def _pack_lengths(lengths: np.ndarray) -> bytes:
    """[256] u8 lengths (<= 15) -> u16 alphabet size + packed nibbles.

    Only lengths up to the highest present symbol are transmitted: an
    8-symbol stream (transforms) costs 2+4 bytes instead of a fixed 128 —
    at 512^2 the fixed tables were ~0.04 bpp of pure overhead."""
    present = np.where(lengths > 0)[0]
    n = int(present[-1]) + 1 if len(present) else 0
    arr = lengths[:n]
    if n % 2:
        arr = np.concatenate([arr, np.zeros(1, np.uint8)])
    hi = arr[0::2].astype(np.uint8)
    lo = arr[1::2].astype(np.uint8)
    return struct.pack("<H", n) + ((hi << 4) | lo).tobytes()


def _unpack_lengths(data: bytes, offset: int) -> tuple[np.ndarray, int]:
    if len(data) < offset + 2:
        raise ValueError("truncated huffman table")
    (n,) = struct.unpack_from("<H", data, offset)
    offset += 2
    if n > 256:
        raise ValueError(f"bad huffman alphabet size {n}")
    nb = (n + 1) // 2
    if len(data) < offset + nb:
        raise ValueError("truncated huffman table")
    b = np.frombuffer(data[offset : offset + nb], np.uint8)
    out = np.zeros(256, np.uint8)
    pair = np.empty(2 * nb, np.uint8)
    pair[0::2] = b >> 4
    pair[1::2] = b & 0xF
    out[:n] = pair[:n]
    return out, offset + nb


def _encode_payload(data: np.ndarray, lengths: np.ndarray,
                    codes: np.ndarray) -> tuple[bytes, int]:
    """Vectorized variable-length bit packing: expand every code to its bit
    rows ([N, 15] MSB-first), mask to the real lengths, compact, packbits."""
    ls = lengths[data].astype(np.int32)  # [N]
    cs = codes[data].astype(np.uint32)
    j = np.arange(_MAX_LEN, dtype=np.int32)[None, :]
    bits = (cs[:, None] >> np.maximum(ls[:, None] - 1 - j, 0)) & 1
    mask = j < ls[:, None]
    flat = bits[mask].astype(np.uint8)
    return np.packbits(flat).tobytes(), int(flat.size)


def _rc_encode(vals, nbits: int) -> bytes:
    """Range-encode (native fast path, python oracle fallback)."""
    from .native import rc_encode_native

    out = rc_encode_native(vals, nbits)
    if out is None:
        out = _rc_encode_py(vals, nbits)
    return out


def _rc_decode(payload: bytes, nbits: int, n: int) -> np.ndarray:
    from .native import rc_decode_native

    out = rc_decode_native(payload, nbits, n)
    if out is None:
        out = _rc_decode_py(payload, nbits, n)
    return out


def encode_uint_stream(vals: np.ndarray, nbits: int) -> bytes:
    """Unsigned values < 2**nbits -> framed mode-2 (range-coded) blob.

    Framing: u8 mode=2 | u32 count | u8 nbits | u32 payload_len | payload.
    The joint alphabet (up to 2**20) is the point: byte-planar Huffman
    cannot see cross-byte correlation.
    """
    vals = np.ascontiguousarray(vals, np.uint32)
    assert 1 <= nbits <= _RC_MAX_NBITS
    payload = _rc_encode(vals, nbits)
    return struct.pack("<BIBI", 2, len(vals), nbits, len(payload)) + payload


def decode_uint_stream(data: bytes, offset: int = 0,
                       expect_count: int | None = None,
                       expect_nbits: int | None = None
                       ) -> tuple[np.ndarray, int]:
    """Framed mode-2 blob -> (u32 array, next offset)."""
    if len(data) < offset + 10:
        raise ValueError("truncated stream header")
    mode, n, nbits, plen = struct.unpack_from("<BIBI", data, offset)
    offset += 10
    if mode != 2:
        raise ValueError(f"expected range-coded stream, got mode {mode}")
    if expect_count is not None and n != expect_count:
        raise ValueError(f"stream count {n} != expected {expect_count}")
    if expect_nbits is not None and nbits != expect_nbits:
        raise ValueError(f"stream nbits {nbits} != expected {expect_nbits}")
    if not 1 <= nbits <= _RC_MAX_NBITS:
        raise ValueError(f"bad nbits {nbits}")
    # probabilities are clamped away from 0/1 by the shift-5 update, so a
    # symbol can cost at most ~6x its nbits — a corrupt length field past
    # that bound fails loudly; truncation is caught by the data length and
    # by the decoder's own underrun check
    if plen > n * nbits + 1024 or len(data) < offset + plen:
        raise ValueError("truncated range-coded payload")
    out = _rc_decode(data[offset : offset + plen], nbits, n)
    return out, offset + plen


def encode_stream(data: np.ndarray) -> bytes:
    """Byte stream -> framed (mode 0 raw / mode 1 huffman / mode 2 range-
    coded) blob, whichever is smallest."""
    data = np.ascontiguousarray(data, np.uint8)
    n = len(data)
    raw = struct.pack("<BI", 0, n) + data.tobytes()
    if n < 64:
        return raw
    counts = np.bincount(data, minlength=256)
    lengths = huffman_lengths(counts)
    codes = canonical_codes(lengths)
    payload, n_bits = _encode_payload(data, lengths, codes)
    coded = (struct.pack("<BII", 1, n, n_bits) + _pack_lengths(lengths)
             + payload)
    best = coded if len(coded) < len(raw) else raw
    # adaptive range coder: no table overhead and adapts to local
    # statistics — usually a few % under the static-Huffman size
    rc = encode_uint_stream(data, 8)
    return rc if len(rc) < len(best) else best


def _decode_tables(lengths: np.ndarray):
    """first_code/first_index per length + symbol table, for canonical
    decode: at length l, code c is valid iff c - first_code[l] <
    count[l]; symbol = symbols[first_index[l] + c - first_code[l]]."""
    counts = np.bincount(lengths[lengths > 0], minlength=_MAX_LEN + 1)
    symbols = np.argsort(np.where(lengths > 0, lengths, 255), kind="stable")
    symbols = symbols[: int((lengths > 0).sum())].astype(np.uint8)
    first_code = np.zeros(_MAX_LEN + 2, np.int64)
    first_index = np.zeros(_MAX_LEN + 2, np.int64)
    code = 0
    idx = 0
    for l in range(1, _MAX_LEN + 1):
        first_code[l] = code
        first_index[l] = idx
        code = (code + int(counts[l])) << 1
        idx += int(counts[l])
    return counts, symbols, first_code, first_index


def _decode_payload_py(payload: bytes, n_bits: int, n_syms: int,
                       lengths: np.ndarray) -> np.ndarray:
    """Symbol-serial canonical decode (numpy/python oracle)."""
    counts, symbols, first_code, first_index = _decode_tables(lengths)
    bits = np.unpackbits(np.frombuffer(payload, np.uint8), count=n_bits)
    out = np.empty(n_syms, np.uint8)
    pos = 0
    bl = bits.tolist()
    cnt = counts.tolist()
    fc = first_code.tolist()
    fi = first_index.tolist()
    sym = symbols.tolist()
    for i in range(n_syms):
        code = 0
        l = 0
        while True:
            if pos >= n_bits:
                raise ValueError("corrupt huffman payload (bits exhausted)")
            code = (code << 1) | bl[pos]
            pos += 1
            l += 1
            off = code - fc[l]
            if l <= _MAX_LEN and 0 <= off < cnt[l]:
                out[i] = sym[fi[l] + off]
                break
            if l > _MAX_LEN:
                raise ValueError("corrupt huffman payload")
    return out


def decode_stream(data: bytes, offset: int = 0,
                  expect_count: int | None = None) -> tuple[np.ndarray, int]:
    """Framed blob -> (byte array, next offset).

    ``expect_count``: when the caller knows the stream's length from its own
    header (field streams do), a corrupted count field fails loudly here
    instead of producing mis-shaped arrays downstream.
    """
    if len(data) < offset + 5:
        raise ValueError("truncated stream header")
    mode, n = struct.unpack_from("<BI", data, offset)
    if mode == 2:
        out, offset = decode_uint_stream(data, offset,
                                         expect_count=expect_count,
                                         expect_nbits=8)
        return out.astype(np.uint8), offset
    offset += 5
    if expect_count is not None and n != expect_count:
        raise ValueError(f"stream count {n} != expected {expect_count}")
    if mode == 0:
        out = np.frombuffer(data[offset : offset + n], np.uint8)
        if len(out) != n:
            raise ValueError("truncated raw stream")
        return out, offset + n
    if mode != 1:
        raise ValueError(f"unknown stream mode {mode}")
    if len(data) < offset + 4:
        raise ValueError("truncated stream header")
    (n_bits,) = struct.unpack_from("<I", data, offset)
    offset += 4
    if n > n_bits:  # every huffman symbol costs >= 1 bit: corrupt count
        raise ValueError(f"stream count {n} exceeds bit budget {n_bits}")
    lengths, offset = _unpack_lengths(data, offset)
    n_bytes = (n_bits + 7) // 8
    payload = data[offset : offset + n_bytes]
    if len(payload) != n_bytes:
        raise ValueError("truncated huffman payload")
    from .native import decode_huffman_native

    out = decode_huffman_native(payload, n_bits, n, lengths)
    if out is None:
        out = _decode_payload_py(payload, n_bits, n, lengths)
    return out, offset + n_bytes
