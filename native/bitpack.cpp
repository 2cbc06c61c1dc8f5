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

// Canonical-Huffman symbol-serial decode (the entropy layer's host-bound
// loop; table layout must match codec/entropy.py::_decode_tables).
// Returns 0 on success, nonzero on a corrupt payload.
int ftc_huffman_decode(const uint8_t* payload, size_t n_payload,
                       size_t n_bits, const uint8_t* lengths,
                       uint8_t* out, size_t n_syms) {
    int counts[16] = {0};
    for (int s = 0; s < 256; ++s) {
        if (lengths[s] > 15) return 2;
        if (lengths[s]) counts[lengths[s]]++;
    }
    uint8_t symbols[256];
    int k = 0;
    for (int l = 1; l <= 15; ++l)
        for (int s = 0; s < 256; ++s)
            if (lengths[s] == l) symbols[k++] = static_cast<uint8_t>(s);
    int first_code[17];
    int first_index[17];
    int code = 0, idx = 0;
    for (int l = 1; l <= 15; ++l) {
        first_code[l] = code;
        first_index[l] = idx;
        code = (code + counts[l]) << 1;
        idx += counts[l];
    }
    if (n_bits > n_payload * 8) return 3;
    size_t pos = 0;
    for (size_t i = 0; i < n_syms; ++i) {
        int c = 0, l = 0;
        for (;;) {
            if (pos >= n_bits) return 1;
            const int bit = (payload[pos >> 3] >> (7u - (pos & 7u))) & 1;
            ++pos;
            c = (c << 1) | bit;
            ++l;
            if (l > 15) return 1;
            const int off = c - first_code[l];
            if (off >= 0 && off < counts[l]) {
                out[i] = symbols[first_index[l] + off];
                break;
            }
        }
    }
    return 0;
}

}  // extern "C"
