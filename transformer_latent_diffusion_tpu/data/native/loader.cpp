// Native host-side batch assembly for the training data path.
//
// The reference keeps the whole latent dataset in host RAM and lets the
// torch DataLoader gather batches (train.py:72-76). Here the hot host
// loop — gather rows by shuffled index out of a (possibly memory-mapped)
// array, optionally dequantizing uint8-quantized latents
// (reference data.py:52-60) — is a small OpenMP C++ library driven from
// Python via ctypes (see data/loader.py). Keeps the TPU fed without
// Python-loop overhead at production batch sizes.

#include <cstdint>
#include <cstring>

extern "C" {

// Gather rows: dst[i, :] = src[idx[i], :]
void gather_f32(const float* src, const int64_t* idx, float* dst,
                int64_t n_idx, int64_t row_elems) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_idx; ++i) {
        std::memcpy(dst + i * row_elems, src + idx[i] * row_elems,
                    sizeof(float) * row_elems);
    }
}

void gather_f16_to_f32(const uint16_t* src, const int64_t* idx, float* dst,
                       int64_t n_idx, int64_t row_elems) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_idx; ++i) {
        const uint16_t* s = src + idx[i] * row_elems;
        float* d = dst + i * row_elems;
        for (int64_t j = 0; j < row_elems; ++j) {
            // f16 -> f32 (scalar; bulk is memory-bound anyway)
            uint16_t h = s[j];
            uint32_t sign = (uint32_t)(h & 0x8000) << 16;
            uint32_t exp = (h >> 10) & 0x1F;
            uint32_t man = h & 0x3FF;
            uint32_t f;
            if (exp == 0) {
                if (man == 0) {
                    f = sign;
                } else {
                    exp = 127 - 15 + 1;
                    while ((man & 0x400) == 0) { man <<= 1; --exp; }
                    man &= 0x3FF;
                    f = sign | (exp << 23) | (man << 13);
                }
            } else if (exp == 31) {
                f = sign | 0x7F800000u | (man << 13);
            } else {
                f = sign | ((exp - 15 + 127) << 23) | (man << 13);
            }
            std::memcpy(d + j, &f, 4);
        }
    }
}

// Gather + dequantize uint8 latents: dst = (src/255*2 - 1) * clip_val
// (parity with reference dequantize_latents, data.py:58-60)
void gather_dequant_u8(const uint8_t* src, const int64_t* idx, float* dst,
                       int64_t n_idx, int64_t row_elems, float clip_val) {
    float lut[256];
    for (int v = 0; v < 256; ++v) {
        lut[v] = ((float)v / 255.0f * 2.0f - 1.0f) * clip_val;
    }
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_idx; ++i) {
        const uint8_t* s = src + idx[i] * row_elems;
        float* d = dst + i * row_elems;
        for (int64_t j = 0; j < row_elems; ++j) d[j] = lut[s[j]];
    }
}

}  // extern "C"
