// miotts_native: host-side native kernels for the TPU framework.
//
// The reference gets its native model-IO layer from ggml (GGUF block
// dequant, SURVEY.md §2.2); here the equivalent host path is this small
// C++17 library, loaded via ctypes (no pybind11 in the image).  It covers
// the model-load hot loops — GGUF quant-block repacking into the planar
// device layout (values int8 [K-major] + per-group scales) and half-float
// conversions — which otherwise dominate cold-start time for multi-GB
// checkpoints.  Layouts are bit-identical to miotts_tpu/gguf/quants.py
// (the numpy path remains as reference and fallback).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        miotts_native.cpp -o libmiotts_native.so

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {
            // subnormal: mant * 2^-24 = 1.frac * 2^(-14 - shift) after
            // normalizing (NOT -15: the subnormal exponent is e_min = -14)
            int shift = 0;
            while (!(mant & 0x400)) { mant <<= 1; shift++; }
            mant &= 0x3FF;
            bits = sign | ((127 - 14 - shift) << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

// Parallel-for over rows using a small thread pool sized to the host.
template <typename F>
void parallel_rows(int64_t n_rows, F&& fn) {
    unsigned hw = std::thread::hardware_concurrency();
    int n_threads = hw ? (int)hw : 2;
    if (n_rows < 64 || n_threads <= 1) {
        for (int64_t r = 0; r < n_rows; r++) fn(r);
        return;
    }
    std::atomic<int64_t> next{0};
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++) {
        pool.emplace_back([&] {
            int64_t r;
            while ((r = next.fetch_add(1)) < n_rows) fn(r);
        });
    }
    for (auto& th : pool) th.join();
}

// Blocked transposes: strided writes confined to a cache-resident tile.
// Unpack+transpose in two sequential-write phases is ~8x faster than
// unpacking straight into the transposed layout (measured on this host).
template <typename T>
void transpose_blocked(const T* src, T* dst, int64_t rows, int64_t cols) {
    const int64_t B = 64;
    std::atomic<int64_t> next{0};
    int64_t n_row_tiles = (rows + B - 1) / B;
    int64_t n_col_tiles = (cols + B - 1) / B;
    int64_t n_tiles = n_row_tiles * n_col_tiles;
    unsigned hw = std::thread::hardware_concurrency();
    int n_threads = hw ? (int)hw : 2;
    auto work = [&] {
        int64_t t;
        while ((t = next.fetch_add(1)) < n_tiles) {
            int64_t rt = t / n_col_tiles, ct = t % n_col_tiles;
            int64_t r0 = rt * B, r1 = std::min(rows, r0 + B);
            int64_t c0 = ct * B, c1 = std::min(cols, c0 + B);
            for (int64_t r = r0; r < r1; r++) {
                for (int64_t c = c0; c < c1; c++) {
                    dst[c * rows + r] = src[r * cols + c];
                }
            }
        }
    };
    if (n_tiles < 4 || n_threads <= 1) {
        int64_t t = 0;
        next.store(n_tiles);
        for (t = 0; t < n_tiles; t++) {
            int64_t rt = t / n_col_tiles, ct = t % n_col_tiles;
            int64_t r0 = rt * B, r1 = std::min(rows, r0 + B);
            int64_t c0 = ct * B, c1 = std::min(cols, c0 + B);
            for (int64_t r = r0; r < r1; r++)
                for (int64_t c = c0; c < c1; c++)
                    dst[c * rows + r] = src[r * cols + c];
        }
        return;
    }
    std::vector<std::thread> pool;
    for (int i = 0; i < n_threads; i++) pool.emplace_back(work);
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// f16 buffer -> f32
void miotts_f16_to_f32(const uint16_t* src, float* dst, int64_t n) {
    parallel_rows((n + 4095) / 4096, [&](int64_t blk) {
        int64_t lo = blk * 4096, hi = std::min(n, lo + 4096);
        for (int64_t i = lo; i < hi; i++) dst[i] = f16_to_f32(src[i]);
    });
}

// bf16 buffer -> f32
void miotts_bf16_to_f32(const uint16_t* src, float* dst, int64_t n) {
    parallel_rows((n + 4095) / 4096, [&](int64_t blk) {
        int64_t lo = blk * 4096, hi = std::min(n, lo + 4096);
        for (int64_t i = lo; i < hi; i++) {
            uint32_t bits = (uint32_t)src[i] << 16;
            std::memcpy(&dst[i], &bits, 4);
        }
    });
}

// Q8_0 raw blocks ([f16 d][32 x i8] per 32 elems) for a [rows, cols]
// matrix -> transposed planar layout: values int8 [cols, rows],
// scales f32 [cols/32, rows]  (the QTensor storage orientation).
void miotts_repack_q8_0_t(const uint8_t* raw, int64_t rows, int64_t cols,
                          int8_t* values_t, float* scales_t) {
    const int64_t blocks_per_row = cols / 32;
    std::vector<int8_t> vals(rows * cols);
    std::vector<float> scl(rows * blocks_per_row);
    parallel_rows(rows, [&](int64_t r) {
        const uint8_t* p = raw + r * blocks_per_row * 34;
        int8_t* vrow = vals.data() + r * cols;
        float* srow = scl.data() + r * blocks_per_row;
        for (int64_t b = 0; b < blocks_per_row; b++) {
            uint16_t d16;
            std::memcpy(&d16, p, 2);
            srow[b] = f16_to_f32(d16);
            std::memcpy(vrow + b * 32, p + 2, 32);
            p += 34;
        }
    });
    transpose_blocked(vals.data(), values_t, rows, cols);
    transpose_blocked(scl.data(), scales_t, rows, blocks_per_row);
}

// Q6_K raw super-blocks (210 bytes per 256 elems) -> transposed planar:
// values int8 [cols, rows] (centered, q-32), scales f32 [cols/16, rows].
void miotts_repack_q6_k_t(const uint8_t* raw, int64_t rows, int64_t cols,
                          int8_t* values_t, float* scales_t) {
    const int64_t sb_per_row = cols / 256;
    std::vector<int8_t> vals(rows * cols);
    std::vector<float> scl(rows * sb_per_row * 16);
    parallel_rows(rows, [&](int64_t r) {
        const uint8_t* p = raw + r * sb_per_row * 210;
        int8_t* vrow = vals.data() + r * cols;
        float* srow = scl.data() + r * sb_per_row * 16;
        for (int64_t sb = 0; sb < sb_per_row; sb++) {
            const uint8_t* ql = p;
            const uint8_t* qh = p + 128;
            const int8_t* sc = (const int8_t*)(p + 192);
            uint16_t d16;
            std::memcpy(&d16, p + 208, 2);
            float d = f16_to_f32(d16);
            int64_t base = sb * 256;
            for (int half = 0; half < 2; half++) {
                const uint8_t* l = ql + half * 64;
                const uint8_t* h = qh + half * 32;
                int64_t hbase = base + half * 128;
                for (int j = 0; j < 32; j++) {
                    vrow[hbase + j] = (int8_t)(((l[j] & 0x0F) | (((h[j] >> 0) & 3) << 4)) - 32);
                    vrow[hbase + 32 + j] = (int8_t)(((l[j + 32] & 0x0F) | (((h[j] >> 2) & 3) << 4)) - 32);
                    vrow[hbase + 64 + j] = (int8_t)(((l[j] >> 4) | (((h[j] >> 4) & 3) << 4)) - 32);
                    vrow[hbase + 96 + j] = (int8_t)(((l[j + 32] >> 4) | (((h[j] >> 6) & 3) << 4)) - 32);
                }
            }
            for (int g = 0; g < 16; g++) {
                srow[sb * 16 + g] = d * (float)sc[g];
            }
            p += 210;
        }
    });
    transpose_blocked(vals.data(), values_t, rows, cols);
    transpose_blocked(scl.data(), scales_t, rows, sb_per_row * 16);
}

// Q4_K raw super-blocks (144 bytes per 256 elems) -> transposed planar:
// values int8 [cols, rows] (0..15), scales f32 [cols/32, rows],
// mins f32 [cols/32, rows]  (w = v*scale - min).
void miotts_repack_q4_k_t(const uint8_t* raw, int64_t rows, int64_t cols,
                          int8_t* values_t, float* scales_t, float* mins_t) {
    const int64_t sb_per_row = cols / 256;
    std::vector<int8_t> vals(rows * cols);
    std::vector<float> scl(rows * sb_per_row * 8);
    std::vector<float> mnl(rows * sb_per_row * 8);
    parallel_rows(rows, [&](int64_t r) {
        const uint8_t* p = raw + r * sb_per_row * 144;
        int8_t* vrow = vals.data() + r * cols;
        float* srow = scl.data() + r * sb_per_row * 8;
        float* mrow = mnl.data() + r * sb_per_row * 8;
        for (int64_t sb = 0; sb < sb_per_row; sb++) {
            uint16_t d16, m16;
            std::memcpy(&d16, p, 2);
            std::memcpy(&m16, p + 2, 2);
            float d = f16_to_f32(d16);
            float dmin = f16_to_f32(m16);
            const uint8_t* scb = p + 4;
            uint8_t sc6[8], mn6[8];
            for (int j = 0; j < 4; j++) {
                sc6[j] = scb[j] & 63;
                mn6[j] = scb[j + 4] & 63;
            }
            for (int j = 4; j < 8; j++) {
                sc6[j] = (scb[j + 4] & 0x0F) | ((scb[j - 4] >> 6) << 4);
                mn6[j] = (scb[j + 4] >> 4) | ((scb[j] >> 6) << 4);
            }
            const uint8_t* qs = p + 16;
            int64_t base = sb * 256;
            for (int c = 0; c < 4; c++) {
                const uint8_t* chunk = qs + c * 32;
                int64_t cb = base + c * 64;
                for (int j = 0; j < 32; j++) {
                    vrow[cb + j] = (int8_t)(chunk[j] & 0x0F);
                    vrow[cb + 32 + j] = (int8_t)(chunk[j] >> 4);
                }
            }
            for (int g = 0; g < 8; g++) {
                srow[sb * 8 + g] = d * (float)sc6[g];
                mrow[sb * 8 + g] = dmin * (float)mn6[g];
            }
            p += 144;
        }
    });
    transpose_blocked(vals.data(), values_t, rows, cols);
    transpose_blocked(scl.data(), scales_t, rows, sb_per_row * 8);
    transpose_blocked(mnl.data(), mins_t, rows, sb_per_row * 8);
}

// float PCM -> s16le (the WAV writer hot loop).  Reference semantics are
// clamp AFTER scaling (wav-writer.cpp:39-42): a hard-clipped sample below
// -1 maps to -32768, not -32767.
void miotts_f32_to_s16(const float* src, int16_t* dst, int64_t n) {
    parallel_rows((n + 65535) / 65536, [&](int64_t blk) {
        int64_t lo = blk * 65536, hi = std::min(n, lo + 65536);
        for (int64_t i = lo; i < hi; i++) {
            float v = src[i] * 32767.0f;
            if (v > 32767.0f) v = 32767.0f;
            if (v < -32768.0f) v = -32768.0f;
            dst[i] = (int16_t)v;
        }
    });
}

int miotts_native_version() { return 1; }

}  // extern "C"
