// hostops — native host-side image ops for the diffute_tpu data path.
//
// The reference's host preprocessing runs through OpenCV/PIL (C++/C under
// Python, reference train_diffute_v1.py:336-348, app.ipynb:332-344).  This
// first-party library fuses the per-region hot path into single passes over
// the buffers, removing the intermediate uint8 allocations the
// cv2-then-normalize sequence makes:
//
//   crop_resize_normalize_f32: uint8 HWC window -> bilinear resize ->
//       (x/255 - 0.5)/0.5 float32, one pass (feeds VAE inputs)
//   resize_bilinear_u8: cv2::resize(INTER_LINEAR)-compatible uint8 resize
//   masked_fill_u8: image * (mask < 0.5) (reference train_diffute_v1.py:385-388)
//
// Bilinear sampling matches cv2 INTER_LINEAR: src coordinate
// (d + 0.5) * scale - 0.5, edge-clamped, fixed rounding.
//
// Build: cc -O3 -march=native -shared -fPIC hostops.cpp -o libhostops.so
// Loaded via ctypes (diffute_tpu/io/hostops.py); numpy/cv2 fallback when the
// shared object is absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

static inline float src_coord(int d, double scale) {
  return static_cast<float>((d + 0.5) * scale - 0.5);
}

// Generic bilinear resize for uint8 HWC images (any channel count).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = src_coord(y, sy);
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    if (y0 > sh - 1) y0 = sh - 1;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * c;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * c;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      float fx = src_coord(x, sx);
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, sw - 1);
      x0 = std::max(x0, 0);
      if (x0 > sw - 1) x0 = sw - 1;
      for (int k = 0; k < c; ++k) {
        float v00 = r0[x0 * c + k], v01 = r0[x1 * c + k];
        float v10 = r1[x0 * c + k], v11 = r1[x1 * c + k];
        float top = v00 + (v01 - v00) * wx;
        float bot = v10 + (v11 - v10) * wx;
        float v = top + (bot - top) * wy;
        out[x * c + k] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Fused: bilinear resize + albumentations Normalize(0.5, 0.5) -> float32.
void crop_resize_normalize_f32(const uint8_t* src, int sh, int sw, int c,
                               float* dst, int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  constexpr float kScale = 2.0f / 255.0f;  // (v/255 - 0.5) / 0.5
  for (int y = 0; y < dh; ++y) {
    float fy = src_coord(y, sy);
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    if (y0 > sh - 1) y0 = sh - 1;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * c;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * c;
    float* out = dst + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      float fx = src_coord(x, sx);
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, sw - 1);
      x0 = std::max(x0, 0);
      if (x0 > sw - 1) x0 = sw - 1;
      for (int k = 0; k < c; ++k) {
        float v00 = r0[x0 * c + k], v01 = r0[x1 * c + k];
        float v10 = r1[x0 * c + k], v11 = r1[x1 * c + k];
        float top = v00 + (v01 - v00) * wx;
        float bot = v10 + (v11 - v10) * wx;
        float v = top + (bot - top) * wy;
        out[x * c + k] = v * kScale - 1.0f;
      }
    }
  }
}

// image * (mask < 0.5), HWC uint8 with (h, w) uint8 mask.
void masked_fill_u8(const uint8_t* src, const uint8_t* mask, int h, int w,
                    int c, uint8_t* dst) {
  for (int i = 0; i < h * w; ++i) {
    if (mask[i] == 0) {
      std::memcpy(dst + static_cast<size_t>(i) * c,
                  src + static_cast<size_t>(i) * c, c);
    } else {
      std::memset(dst + static_cast<size_t>(i) * c, 0, c);
    }
  }
}

}  // extern "C"
