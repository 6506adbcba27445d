// Native image pipeline ops for the Groma-TPU data loader.
//
// TPU-native equivalent of the reference's native data-path dependencies
// (mmcv's cv2-backed imresize/normalize used by every dataset pipeline,
// reference: mmdet/datasets/pipelines/transforms.py Resize/Normalize).
// Exposed through ctypes (groma_tpu/data/native_ops.py); the Python
// numpy/cv2 implementation remains as reference + fallback.
//
// Semantics: OpenCV INTER_LINEAR — half-pixel centers, border clamp —
// matching cv2.resize exactly so the fallback and the native path are
// interchangeable bit-for-bit (verified in tests/test_native_ops.py).
//
// Build: make -C native   (g++ -O3 -march=native -fopenmp-simd)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Bilinear resize HWC uint8 -> uint8, cv2 INTER_LINEAR semantics.
void resize_bilinear_u8(const uint8_t* src, int64_t sh, int64_t sw,
                        int64_t c, uint8_t* dst, int64_t dh, int64_t dw) {
  const double scale_y = static_cast<double>(sh) / dh;
  const double scale_x = static_cast<double>(sw) / dw;

  std::vector<int32_t> x0(dw), x1(dw);
  std::vector<float> fx(dw);
  for (int64_t x = 0; x < dw; ++x) {
    double sx = (x + 0.5) * scale_x - 0.5;
    double floor_sx = std::floor(sx);
    int32_t ix = static_cast<int32_t>(floor_sx);
    float frac = static_cast<float>(sx - floor_sx);
    if (ix < 0) { ix = 0; frac = 0.f; }
    if (ix >= sw - 1) { ix = static_cast<int32_t>(sw) - 1; frac = 0.f; }
    x0[x] = ix;
    x1[x] = std::min<int32_t>(ix + 1, static_cast<int32_t>(sw) - 1);
    fx[x] = frac;
  }

  auto row_range = [&](int64_t y_begin, int64_t y_end) {
    for (int64_t y = y_begin; y < y_end; ++y) {
      double sy = (y + 0.5) * scale_y - 0.5;
      double floor_sy = std::floor(sy);
      int32_t iy = static_cast<int32_t>(floor_sy);
      float fy = static_cast<float>(sy - floor_sy);
      if (iy < 0) { iy = 0; fy = 0.f; }
      if (iy >= sh - 1) { iy = static_cast<int32_t>(sh) - 1; fy = 0.f; }
      int32_t iy1 = std::min<int32_t>(iy + 1, static_cast<int32_t>(sh) - 1);
      const uint8_t* r0 = src + (int64_t)iy * sw * c;
      const uint8_t* r1 = src + (int64_t)iy1 * sw * c;
      uint8_t* out = dst + y * dw * c;
      for (int64_t x = 0; x < dw; ++x) {
        const uint8_t* p00 = r0 + (int64_t)x0[x] * c;
        const uint8_t* p01 = r0 + (int64_t)x1[x] * c;
        const uint8_t* p10 = r1 + (int64_t)x0[x] * c;
        const uint8_t* p11 = r1 + (int64_t)x1[x] * c;
        float w00 = (1.f - fy) * (1.f - fx[x]);
        float w01 = (1.f - fy) * fx[x];
        float w10 = fy * (1.f - fx[x]);
        float w11 = fy * fx[x];
        for (int64_t ch = 0; ch < c; ++ch) {
          float v = w00 * p00[ch] + w01 * p01[ch] + w10 * p10[ch] +
                    w11 * p11[ch];
          // cv2 rounds to nearest for u8 output
          out[x * c + ch] = static_cast<uint8_t>(
              std::min(255.f, std::max(0.f, std::round(v))));
        }
      }
    }
  };

  int64_t n_threads = std::min<int64_t>(
      std::max(1u, std::thread::hardware_concurrency()), dh);
  if (n_threads <= 1 || dh < 64) {
    row_range(0, dh);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (dh + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t b = t * chunk, e = std::min(dh, b + chunk);
    if (b < e) threads.emplace_back(row_range, b, e);
  }
  for (auto& th : threads) th.join();
}

// Fused resize(u8) -> normalize(float32): (x - mean[ch]) / std[ch].
void resize_normalize(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                      float* dst, int64_t dh, int64_t dw, const float* mean,
                      const float* stddev) {
  std::vector<uint8_t> tmp((size_t)dh * dw * c);
  resize_bilinear_u8(src, sh, sw, c, tmp.data(), dh, dw);
  std::vector<float> inv(c);
  for (int64_t ch = 0; ch < c; ++ch) inv[ch] = 1.f / stddev[ch];
  const int64_t n = dh * dw;
  for (int64_t i = 0; i < n; ++i)
    for (int64_t ch = 0; ch < c; ++ch)
      dst[i * c + ch] = (tmp[i * c + ch] - mean[ch]) * inv[ch];
}

// Normalize only (u8 HWC -> f32 HWC).
void normalize_u8(const uint8_t* src, int64_t n_pixels, int64_t c,
                  float* dst, const float* mean, const float* stddev) {
  std::vector<float> inv(c);
  for (int64_t ch = 0; ch < c; ++ch) inv[ch] = 1.f / stddev[ch];
  for (int64_t i = 0; i < n_pixels; ++i)
    for (int64_t ch = 0; ch < c; ++ch)
      dst[i * c + ch] = (src[i * c + ch] - mean[ch]) * inv[ch];
}

}  // extern "C"
