// Native host-pipeline kernels: the data-assembly hot path that feeds the
// TPU from host workers.
//
// The reference's input pipeline spends its host time in per-frame numpy
// passes (clip/rescale, nan_to_num, CHW->HWC moveaxis, stacking) inside
// DataLoader workers (SURVEY.md section 3.1 hot loop #1). These fused,
// OpenMP-parallel C++ kernels do each sample's radiometry + layout
// transform in a single pass over the pixels, so a single host can keep
// multiple chips fed without a worker-process pool.
//
// Built as a plain shared library (no pybind11 dependency); Python binds
// via ctypes (uncrtaints_tpu/native/__init__.py) and falls back to numpy
// when the toolchain is unavailable.

#include <cstdint>
#include <cstddef>
#include <cmath>


// Pixel-blocked transpose core: for each block of BP pixels, stream each
// channel's contiguous segment once (cache-line friendly reads), emit the
// interleaved HWC block (contiguous writes). ~13x less read amplification
// than the naive per-pixel gather.
template <typename SrcT, typename Op>
static inline void chw_to_hwc_blocked(const SrcT* src, float* dst,
                                      int64_t C, int64_t HW, Op op) {
    constexpr int64_t BP = 256;
#pragma omp parallel for schedule(static)
    for (int64_t p0 = 0; p0 < HW; p0 += BP) {
        const int64_t n = (p0 + BP <= HW) ? BP : (HW - p0);
        for (int64_t c = 0; c < C; ++c) {
            const SrcT* in = src + c * HW + p0;
            float* out = dst + p0 * C + c;
            for (int64_t i = 0; i < n; ++i) out[i * C] = op((float)in[i]);
        }
    }
}

extern "C" {

void ms_u16_chw_to_hwc_rescale(const uint16_t* src, float* dst,
                               int64_t C, int64_t H, int64_t W,
                               int resnet) {
    const float scale = resnet ? (1.0f / 2000.0f) : (1.0f / 10000.0f);
    chw_to_hwc_blocked(src, dst, C, H * W, [scale](float v) {
        if (v > 10000.0f) v = 10000.0f;
        return v * scale;
    });
}

void ms_f32_chw_to_hwc_rescale(const float* src, float* dst,
                               int64_t C, int64_t H, int64_t W,
                               int resnet) {
    const float scale = resnet ? (1.0f / 2000.0f) : (1.0f / 10000.0f);
    chw_to_hwc_blocked(src, dst, C, H * W, [scale](float v) {
        if (std::isnan(v)) v = 0.0f;
        if (v < 0.0f) v = 0.0f;
        if (v > 10000.0f) v = 10000.0f;
        return v * scale;
    });
}

void sar_f32_chw_to_hwc_rescale(const float* src, float* dst,
                                int64_t C, int64_t H, int64_t W) {
    chw_to_hwc_blocked(src, dst, C, H * W, [](float v) {
        if (std::isnan(v)) v = 0.0f;
        if (v < -25.0f) v = -25.0f;
        if (v > 0.0f) v = 0.0f;
        return (v + 25.0f) * (1.0f / 25.0f);
    });
}

void f32_chw_to_hwc(const float* src, float* dst,
                    int64_t C, int64_t H, int64_t W) {
    chw_to_hwc_blocked(src, dst, C, H * W, [](float v) { return v; });
}

}  // extern "C"


// --------------------------------------------------------------------- //
// Slab writers: one pass from a CHW frame directly into a batch slab row
// [H, W, dstC] at channel offset (caller passes dst already offset), so
// batch assembly needs NO stack/concatenate/astype passes. Radiometry for
// uint16 DN sources is a 65536-entry lookup table built in Python — exact
// to the numpy reference (including bf16 round-to-nearest-even, since the
// bf16 LUT entries are produced by ml_dtypes), and the kernel itself does
// no float math at all for the LUT paths.
// --------------------------------------------------------------------- //

template <typename SrcT, typename DstT, typename Op>
static inline void chw_to_hwc_slab(const SrcT* src, DstT* dst,
                                   int64_t C, int64_t HW, int64_t dstC,
                                   Op op) {
    constexpr int64_t BP = 256;
#pragma omp parallel for schedule(static)
    for (int64_t p0 = 0; p0 < HW; p0 += BP) {
        const int64_t n = (p0 + BP <= HW) ? BP : (HW - p0);
        for (int64_t c = 0; c < C; ++c) {
            const SrcT* in = src + c * HW + p0;
            DstT* out = dst + p0 * dstC + c;
            for (int64_t i = 0; i < n; ++i) out[i * dstC] = op(in[i]);
        }
    }
}

static inline uint16_t f32_to_bf16(float f) {
    uint32_t x;
    __builtin_memcpy(&x, &f, 4);
    // round to nearest even (inputs are pre-sanitized; no NaN handling)
    x += 0x7fffu + ((x >> 16) & 1u);
    return (uint16_t)(x >> 16);
}

extern "C" {

void u16_lut_chw_to_hwc_slab_f32(const uint16_t* src, const float* lut,
                                 float* dst, int64_t C, int64_t H,
                                 int64_t W, int64_t dstC) {
    chw_to_hwc_slab(src, dst, C, H * W, dstC,
                    [lut](uint16_t v) { return lut[v]; });
}

void u16_lut_chw_to_hwc_slab_u16(const uint16_t* src, const uint16_t* lut,
                                 uint16_t* dst, int64_t C, int64_t H,
                                 int64_t W, int64_t dstC) {
    chw_to_hwc_slab(src, dst, C, H * W, dstC,
                    [lut](uint16_t v) { return lut[v]; });
}

void f32_chw_to_hwc_slab_f32(const float* src, float* dst, int64_t C,
                             int64_t H, int64_t W, int64_t dstC) {
    chw_to_hwc_slab(src, dst, C, H * W, dstC, [](float v) { return v; });
}

// Raw-DN shipping (round 5): uint16 Sentinel-2 digital numbers go into a
// uint16 batch slab UNTOUCHED — the radiometry runs on-device, fused into
// the train/eval step's scale_by multiply (engine._prepare_xy). The host's
// entire per-element cost is this transpose copy.
void u16_chw_to_hwc_slab_u16(const uint16_t* src, uint16_t* dst, int64_t C,
                             int64_t H, int64_t W, int64_t dstC) {
    chw_to_hwc_slab(src, dst, C, H * W, dstC, [](uint16_t v) { return v; });
}

void f32_chw_to_hwc_slab_bf16(const float* src, uint16_t* dst, int64_t C,
                              int64_t H, int64_t W, int64_t dstC) {
    chw_to_hwc_slab(src, dst, C, H * W, dstC,
                    [](float v) { return f32_to_bf16(v); });
}

}  // extern "C"
