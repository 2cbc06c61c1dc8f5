// Native bit-packing for the compressed stream.
//
// TPU-native framework, host-side runtime component: the reference keeps its
// whole runtime in C++ (SURVEY.md L0/C17); here only the host-bound codec hot
// path is native — packing/unpacking millions of variable-width integer
// fields per 4K frame, which is branchy bit twiddling Python/numpy does with
// multiple large temporaries.  Exposed through a C ABI and loaded with
// ctypes (no pybind11 dependency); the numpy implementation remains as a
// fallback and as the oracle in tests.
//
// Bit layout contract (must match codec/bitstream.py): per item, MSB-first
// within the stream: valid(1) | domain(d_bits) | transform(t_bits) |
// s_q(s_bits) | o_q(o_bits).  Items are concatenated without padding; the
// final byte is zero-padded.

#include <cstdint>
#include <cstddef>
#include <cstring>

namespace {

struct BitWriter {
    uint8_t* out;
    size_t bitpos = 0;
    void put(uint64_t value, unsigned width) {
        // MSB-first: highest bit of the field lands first.
        for (int b = static_cast<int>(width) - 1; b >= 0; --b) {
            const uint64_t bit = (value >> b) & 1u;
            const size_t byte = bitpos >> 3;
            const unsigned off = 7u - (bitpos & 7u);
            out[byte] = static_cast<uint8_t>(out[byte] | (bit << off));
            ++bitpos;
        }
    }
};

struct BitReader {
    const uint8_t* in;
    size_t bitpos = 0;
    uint64_t get(unsigned width) {
        uint64_t v = 0;
        for (unsigned i = 0; i < width; ++i) {
            const size_t byte = bitpos >> 3;
            const unsigned off = 7u - (bitpos & 7u);
            v = (v << 1) | ((in[byte] >> off) & 1u);
            ++bitpos;
        }
        return v;
    }
};

}  // namespace

extern "C" {

// Returns the number of bytes written (caller sizes out as
// ceil(n*(1+d+t+s+o)/8) and zero-initializes it).
size_t ftc_pack_items(size_t n,
                      const uint32_t* dom, const uint32_t* tr,
                      const uint32_t* sq, const uint32_t* oq,
                      const uint8_t* valid,
                      unsigned d_bits, unsigned t_bits,
                      unsigned s_bits, unsigned o_bits,
                      uint8_t* out) {
    BitWriter w{out};
    for (size_t i = 0; i < n; ++i) {
        w.put(valid[i] ? 1u : 0u, 1);
        w.put(dom[i], d_bits);
        w.put(tr[i], t_bits);
        w.put(sq[i], s_bits);
        w.put(oq[i], o_bits);
    }
    return (w.bitpos + 7) >> 3;
}

void ftc_unpack_items(size_t n, const uint8_t* in,
                      unsigned d_bits, unsigned t_bits,
                      unsigned s_bits, unsigned o_bits,
                      uint32_t* dom, uint32_t* tr,
                      uint32_t* sq, uint32_t* oq, uint8_t* valid) {
    BitReader r{in};
    for (size_t i = 0; i < n; ++i) {
        valid[i] = static_cast<uint8_t>(r.get(1));
        dom[i] = static_cast<uint32_t>(r.get(d_bits));
        tr[i] = static_cast<uint32_t>(r.get(t_bits));
        sq[i] = static_cast<uint32_t>(r.get(s_bits));
        oq[i] = static_cast<uint32_t>(r.get(o_bits));
    }
}

}  // extern "C"
