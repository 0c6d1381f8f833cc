// Native weight repacker: GGUF packed blocks -> TPU plane layout.
//
// The C++ runtime component of the loader (the llama-model-loader /
// llama-mmap analogue, reference src/llama-model-loader.cpp:879 load_all_data
// + the CPU backend's runtime repacking ggml-cpu-aarch64.cpp): multi-GB
// quantized tensors stream from the mmap straight into the plane buffers the
// Pallas kernels consume, without Python-loop or numpy-temporary overhead.
// Threaded with std::thread (the image has no OpenMP runtime guarantee).
//
// Exposed via a C ABI consumed by ctypes (native/__init__.py); the numpy
// implementation in quant/repack.py stays as the golden reference.
//
// Layout contract (quant/repack.py):
//   qs:    int8/uint8 [N/pack, K], value j packed at bits [j*bits, (j+1)*bits)
//          pairing row r with r + N/(2*pack_extra)... (pack along N)
//   scale: f32 [pack, K/group, N/pack]   (group-major)
//   min_:  f32 [pack, K/group, N/pack]   (optional; x = scale*q - min)
#include <cstdint>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {
            // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; exp--; }
            man &= 0x3FF;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

// 6-bit scale/min unpack for Q4_K/Q5_K (get_scale_min_k4, ggml-quants.c)
inline void k4_scale_min(const uint8_t* q, int j, uint8_t& sc, uint8_t& m) {
    if (j < 4) {
        sc = q[j] & 63;
        m = q[j + 4] & 63;
    } else {
        sc = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
        m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
    }
}

struct PlaneOut {
    uint8_t* qs;      // [n_rows_padded/pack, K] packed (or int8 [N, K])
    float* scale;     // [pack, K/group, npk]
    float* min_;      // may be null
    int64_t n;        // logical rows
    int64_t n_padded; // rows incl. padding
    int64_t k;
    int64_t group;
    int pack;
};

// Per-row decode into caller-provided row buffers (q as int32, s/m per group)
typedef void (*row_decoder)(const uint8_t* src, int64_t k,
                            int32_t* q, float* s, float* m);

void dec_q8_0(const uint8_t* src, int64_t k, int32_t* q, float* s, float*) {
    for (int64_t b = 0; b < k / 32; b++) {
        const uint8_t* blk = src + b * 34;
        uint16_t d16; std::memcpy(&d16, blk, 2);
        s[b] = f16_to_f32(d16);
        const int8_t* qs = (const int8_t*)(blk + 2);
        for (int i = 0; i < 32; i++) q[b * 32 + i] = qs[i];
    }
}

void dec_q4_0(const uint8_t* src, int64_t k, int32_t* q, float* s, float* m) {
    for (int64_t b = 0; b < k / 32; b++) {
        const uint8_t* blk = src + b * 18;
        uint16_t d16; std::memcpy(&d16, blk, 2);
        float d = f16_to_f32(d16);
        s[b] = d;
        m[b] = 8.0f * d;
        for (int i = 0; i < 16; i++) {
            q[b * 32 + i] = blk[2 + i] & 0xF;
            q[b * 32 + 16 + i] = blk[2 + i] >> 4;
        }
    }
}

void dec_q4_1(const uint8_t* src, int64_t k, int32_t* q, float* s, float* m) {
    for (int64_t b = 0; b < k / 32; b++) {
        const uint8_t* blk = src + b * 20;
        uint16_t d16, m16;
        std::memcpy(&d16, blk, 2);
        std::memcpy(&m16, blk + 2, 2);
        s[b] = f16_to_f32(d16);
        m[b] = -f16_to_f32(m16);
        for (int i = 0; i < 16; i++) {
            q[b * 32 + i] = blk[4 + i] & 0xF;
            q[b * 32 + 16 + i] = blk[4 + i] >> 4;
        }
    }
}

void dec_q4_k(const uint8_t* src, int64_t k, int32_t* q, float* s, float* m) {
    for (int64_t b = 0; b < k / 256; b++) {
        const uint8_t* blk = src + b * 144;
        uint16_t d16, dm16;
        std::memcpy(&d16, blk, 2);
        std::memcpy(&dm16, blk + 2, 2);
        float d = f16_to_f32(d16), dmin = f16_to_f32(dm16);
        const uint8_t* scales = blk + 4;
        const uint8_t* qs = blk + 16;
        for (int g = 0; g < 8; g++) {
            uint8_t sc, mn;
            k4_scale_min(scales, g, sc, mn);
            s[b * 8 + g] = d * sc;
            m[b * 8 + g] = dmin * mn;
        }
        // 4 chunks of 32 bytes; chunk c covers groups 2c (lo) and 2c+1 (hi)
        for (int c = 0; c < 4; c++) {
            const uint8_t* qq = qs + c * 32;
            int32_t* lo = q + b * 256 + c * 64;
            for (int i = 0; i < 32; i++) {
                lo[i] = qq[i] & 0xF;
                lo[32 + i] = qq[i] >> 4;
            }
        }
    }
}

void dec_q6_k(const uint8_t* src, int64_t k, int32_t* q, float* s, float*) {
    for (int64_t b = 0; b < k / 256; b++) {
        const uint8_t* blk = src + b * 210;
        const uint8_t* ql = blk;
        const uint8_t* qh = blk + 128;
        const int8_t* sc = (const int8_t*)(blk + 192);
        uint16_t d16; std::memcpy(&d16, blk + 208, 2);
        float d = f16_to_f32(d16);
        for (int g = 0; g < 16; g++) s[b * 16 + g] = d * sc[g];
        for (int half = 0; half < 2; half++) {
            const uint8_t* l = ql + half * 64;
            const uint8_t* h = qh + half * 32;
            int32_t* out = q + b * 256 + half * 128;
            for (int i = 0; i < 32; i++) {
                out[i]      = (int32_t)((l[i] & 0xF) | (((h[i] >> 0) & 3) << 4)) - 32;
                out[32 + i] = (int32_t)((l[32 + i] & 0xF) | (((h[i] >> 2) & 3) << 4)) - 32;
                out[64 + i] = (int32_t)((l[i] >> 4) | (((h[i] >> 4) & 3) << 4)) - 32;
                out[96 + i] = (int32_t)((l[32 + i] >> 4) | (((h[i] >> 6) & 3) << 4)) - 32;
            }
        }
    }
}

struct TypeInfo {
    row_decoder dec;
    int64_t group;
    int pack;       // values packed per output byte along N
    int bits;       // bits per value when packed
    int64_t row_bytes_per_k(int64_t k) const { return 0; }
};

// ggml type ids (gguf/constants.py GGMLType)
TypeInfo type_info(int ggml_type, bool& ok, int64_t& row_bytes, int64_t k) {
    ok = true;
    switch (ggml_type) {
        case 8:  row_bytes = (k / 32) * 34;  return {dec_q8_0, 32, 1, 8};
        case 2:  row_bytes = (k / 32) * 18;  return {dec_q4_0, 32, 2, 4};
        case 3:  row_bytes = (k / 32) * 20;  return {dec_q4_1, 32, 2, 4};
        case 12: row_bytes = (k / 256) * 144; return {dec_q4_k, 32, 2, 4};
        case 14: row_bytes = (k / 256) * 210; return {dec_q6_k, 16, 1, 8};
        default: ok = false; row_bytes = 0;   return {nullptr, 1, 1, 8};
    }
}

void repack_rows(const uint8_t* src, int64_t row_bytes, const TypeInfo& ti,
                 PlaneOut& out, int64_t row_begin, int64_t row_end) {
    const int64_t k = out.k;
    const int64_t g = k / ti.group;
    const int64_t npk = out.n_padded / ti.pack;
    std::vector<int32_t> q(k);
    std::vector<float> s(g), m(g);
    for (int64_t r = row_begin; r < row_end; r++) {
        ti.dec(src + r * row_bytes, k, q.data(), s.data(),
               out.min_ ? m.data() : nullptr);
        // scales: [pack, G, npk]; logical row r -> (h = r / npk, j = r % npk)
        int64_t h = r / npk, j = r % npk;
        for (int64_t gi = 0; gi < g; gi++) {
            out.scale[(h * g + gi) * npk + j] = s[gi];
            if (out.min_) out.min_[(h * g + gi) * npk + j] = m[gi];
        }
        if (ti.pack == 1) {
            int8_t* dst = (int8_t*)out.qs + r * k;
            for (int64_t i = 0; i < k; i++) dst[i] = (int8_t)q[i];
        } else {
            uint8_t* dst = out.qs + j * k;
            int shift = ti.bits * (int)h;
            uint8_t mask = (uint8_t)(((1 << ti.bits) - 1) << shift);
            for (int64_t i = 0; i < k; i++) {
                dst[i] = (uint8_t)((dst[i] & ~mask) |
                                   ((q[i] & ((1 << ti.bits) - 1)) << shift));
            }
        }
    }
}

}  // namespace

extern "C" {

// Returns 1 if this ggml type has a native fast path.
int ggufio_supports(int ggml_type) {
    bool ok;
    int64_t rb;
    type_info(ggml_type, ok, rb, 256);
    return ok ? 1 : 0;
}

// Repack a packed GGUF tensor into plane buffers (caller-allocated, zeroed).
//   src:      packed bytes, n rows x row_bytes
//   qs:       [n_padded/pack * k] bytes (uint8/int8)
//   scale:    [pack * (k/group) * (n_padded/pack)] f32
//   min_:     same shape as scale, or nullptr for types without mins
// Returns 0 on success, -1 on unsupported type.
int ggufio_repack(int ggml_type, const uint8_t* src, int64_t n,
                  int64_t n_padded, int64_t k,
                  uint8_t* qs, float* scale, float* min_, int n_threads) {
    bool ok;
    int64_t row_bytes;
    TypeInfo ti = type_info(ggml_type, ok, row_bytes, k);
    if (!ok) return -1;
    PlaneOut out{qs, scale, min_, n, n_padded, k, ti.group, ti.pack};
    if (n_threads <= 1 || n < 64) {
        repack_rows(src, row_bytes, ti, out, 0, n);
        return 0;
    }
    // threads split rows; nibble-packing writes are racy only if two rows
    // share an output byte — rows j and j+npk share dst row j. Split so each
    // thread owns a contiguous range of PLANE rows across all pack values.
    int64_t npk = n_padded / ti.pack;
    std::vector<std::thread> ts;
    int64_t per = (npk + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t j0 = t * per, j1 = std::min(npk, (t + 1) * per);
        if (j0 >= j1) break;
        ts.emplace_back([&, j0, j1]() {
            for (int h = 0; h < ti.pack; h++) {
                int64_t r0 = h * npk + j0, r1 = h * npk + j1;
                r0 = std::min(r0, n);
                r1 = std::min(r1, n);
                if (r0 < r1) repack_rows(src, row_bytes, ti, out, r0, r1);
            }
        });
    }
    for (auto& th : ts) th.join();
    return 0;
}

}  // extern "C"
