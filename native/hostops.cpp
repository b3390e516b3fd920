// hostops — native host-side image ops for the diffute_tpu data path.
//
// The reference's host preprocessing runs through OpenCV/PIL (C++/C under
// Python, reference train_diffute_v1.py:336-348, app.ipynb:332-344).  This
// first-party library implements the per-region hot path:
//
//   resize_bilinear_u8: cv2::resize(INTER_LINEAR)-equivalent uint8 resize —
//       separable two-pass with the same 2^11 fixed-point coefficient scheme
//       OpenCV uses (INTER_RESIZE_COEF_BITS = 11, round-half-to-even
//       coefficient quantization, (v + 2^21) >> 22 final descale), so the
//       output is bit-identical to cv2 for upscales and downscales alike.
//   crop_resize_normalize_f32: the same resize fused with albumentations
//       Normalize(0.5, 0.5) -> float32 in the vertical pass (one pass over
//       the buffers, no intermediate uint8 image; reference
//       train_diffute_v1.py:336-340).  The pixel is quantized to uint8
//       exactly as the unfused path does before normalizing, so the output
//       is BIT-IDENTICAL to resize-then-normalize — the fusion saves the
//       intermediate allocation and second memory pass, not precision.
//   masked_fill_u8: image * (mask < 0.5) (reference train_diffute_v1.py:385-388)
//
// Build: cc -O3 -march=native -shared -fPIC hostops.cpp -o libhostops.so
// Loaded via ctypes (diffute_tpu/io/hostops.py); numpy/cv2 fallback when the
// shared object is absent.  Portability caveats: (a) the .so is built with
// -march=native and cached by source mtime only — moving a prebuilt .so to
// a different CPU can SIGILL; rebuild there (delete libhostops.so);
// (b) the bit-exactness emulation below assumes cv2 binaries that use the
// universal-intrinsics VResizeLinearVec_32s8u vertical pass (all official
// pip opencv builds do); a cv2 built without SIMD would take the exact
// FixedPtCast path everywhere and differ from the vector formula in the
// last bit for some inputs — the pinned-exactness tests would catch it.

#include <algorithm>
#include <cfenv>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kCoefBits = 11;                    // INTER_RESIZE_COEF_BITS
constexpr int kCoefScale = 1 << kCoefBits;       // 2048
constexpr int kDescaleBits = kCoefBits * 2;      // 22
constexpr int kDescaleRound = 1 << (kDescaleBits - 1);

// cvRound: round half to even (the default FP environment's rint).
inline int round_half_even(double v) { return static_cast<int>(std::nearbyint(v)); }

// Per-axis interpolation table: source tap index (left of the pair) and the
// two fixed-point weights, computed exactly as OpenCV's resizeGeneric_ does.
struct Table {
  std::vector<int> ofs;     // dst -> left source index
  std::vector<int16_t> a0;  // weight of src[ofs]
  std::vector<int16_t> a1;  // weight of src[ofs + 1]
};

Table make_table(int s, int d) {
  Table t;
  t.ofs.resize(d);
  t.a0.resize(d);
  t.a1.resize(d);
  const double scale = static_cast<double>(s) / d;
  for (int x = 0; x < d; ++x) {
    // cv2 computes the source coordinate in double but truncates to FLOAT
    // before taking the fraction (resize.cpp: `fxx = (float)((dx+0.5)*
    // scale_x - 0.5)`); the coefficient products are float too.  Mirror that
    // exactly — double here produces off-by-one-LSB coefficient rounding.
    float fx = static_cast<float>((x + 0.5) * scale - 0.5);
    int sx = static_cast<int>(std::floor(fx));
    fx -= sx;
    if (sx < 0) { sx = 0; fx = 0.0f; }
    if (sx >= s - 1) { sx = std::max(0, s - 2); fx = s > 1 ? 1.0f : 0.0f; }
    t.ofs[x] = sx;
    // OpenCV quantizes both taps independently with cvRound (half-to-even).
    t.a0[x] = static_cast<int16_t>(round_half_even((1.0f - fx) * kCoefScale));
    t.a1[x] = static_cast<int16_t>(round_half_even(fx * kCoefScale));
  }
  return t;
}

// Horizontal pass for one source row: uint8 (sw, c) -> int32 (dw, c) at
// fixed-point scale 2^11.  max value 255 * 2048 = 522240, well inside int32.
// The second tap is clamped to the last source pixel (its weight is 0 in the
// clamped cases, but the READ must stay in bounds for sw == 1 sources).
inline void hresize_row(const uint8_t* src, int sw, int c, const Table& xt,
                        int dw, int32_t* out) {
  for (int x = 0; x < dw; ++x) {
    const int x0 = xt.ofs[x];
    const int x1 = std::min(x0 + 1, sw - 1);
    const uint8_t* p0 = src + static_cast<size_t>(x0) * c;
    const uint8_t* p1 = src + static_cast<size_t>(x1) * c;
    const int32_t a0 = xt.a0[x], a1 = xt.a1[x];
    int32_t* o = out + static_cast<size_t>(x) * c;
    for (int k = 0; k < c; ++k) o[k] = p0[k] * a0 + p1[k] * a1;
  }
}

// Row cache: horizontally-resized rows for the two vertical taps.  Resizing
// walks dst rows top to bottom, so source taps are non-decreasing and at most
// two rows are live at a time.
struct RowCache {
  std::vector<int32_t> buf[2];
  int sy[2] = {-1, -1};

  const int32_t* get(const uint8_t* src, int sw, int c, const Table& xt,
                     int dw, int want_sy) {
    for (int i = 0; i < 2; ++i)
      if (sy[i] == want_sy) return buf[i].data();
    const int slot = (sy[0] == -1 || sy[0] < sy[1]) ? 0 : 1;
    buf[slot].resize(static_cast<size_t>(dw) * c);
    hresize_row(src + static_cast<size_t>(want_sy) * sw * c, sw, c, xt, dw,
                buf[slot].data());
    sy[slot] = want_sy;
    return buf[slot].data();
  }
};

}  // namespace

extern "C" {

// cv2.resize(INTER_LINEAR)-bit-identical uint8 HWC resize (any channels).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  const Table xt = make_table(sw, dw);
  const Table yt = make_table(sh, dh);
  RowCache rows;
  const size_t row_elems = static_cast<size_t>(dw) * c;
  for (int y = 0; y < dh; ++y) {
    const int sy0 = yt.ofs[y];
    const int sy1 = std::min(sy0 + 1, sh - 1);
    const int32_t b0 = yt.a0[y], b1 = yt.a1[y];
    const int32_t* r0 = rows.get(src, sw, c, xt, dw, sy0);
    const int32_t* r1 = (sy1 == sy0) ? r0 : rows.get(src, sw, c, xt, dw, sy1);
    uint8_t* out = dst + static_cast<size_t>(y) * row_elems;
    // OpenCV's shipped binaries take VResizeLinearVec_32s8u (universal
    // intrinsics) for the vector-width-aligned prefix and the exact
    // FixedPtCast for the tail; the vector path approximates the descale as
    //   ((buf >> 4) * b) >> 16 summed, then (v + 2) >> 2.
    // Replicate both (16-lane granularity) for bit-identical output; our
    // product row widths (512*3, 512*1) are multiples of 16, so the whole
    // row goes through the vector formula exactly as in cv2.
    const size_t vec_end = row_elems & ~static_cast<size_t>(15);
    for (size_t i = 0; i < vec_end; ++i) {
      int32_t v = ((r0[i] >> 4) * b0 >> 16) + ((r1[i] >> 4) * b1 >> 16);
      v = (v + 2) >> 2;
      out[i] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
    for (size_t i = vec_end; i < row_elems; ++i) {
      int32_t v = (r0[i] * b0 + r1[i] * b1 + kDescaleRound) >> kDescaleBits;
      out[i] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

// Fused: the same fixed-point bilinear resize with the albumentations
// Normalize(0.5, 0.5) epilogue in the vertical pass -> float32 in [-1, 1].
// The resize result is quantized to uint8 EXACTLY as resize_bilinear_u8
// does before normalizing, so this is bit-identical to resize-then-
// normalize (the reference's albumentations Resize -> Normalize sequence,
// train_diffute_v1.py:336-340, keeps a uint8 intermediate too) while
// skipping the intermediate image allocation and second memory pass.
void crop_resize_normalize_f32(const uint8_t* src, int sh, int sw, int c,
                               float* dst, int dh, int dw) {
  const Table xt = make_table(sw, dw);
  const Table yt = make_table(sh, dh);
  RowCache rows;
  const size_t row_elems = static_cast<size_t>(dw) * c;
  for (int y = 0; y < dh; ++y) {
    const int sy0 = yt.ofs[y];
    const int sy1 = std::min(sy0 + 1, sh - 1);
    const int32_t b0 = yt.a0[y], b1 = yt.a1[y];
    const int32_t* r0 = rows.get(src, sw, c, xt, dw, sy0);
    const int32_t* r1 = (sy1 == sy0) ? r0 : rows.get(src, sw, c, xt, dw, sy1);
    float* out = dst + static_cast<size_t>(y) * row_elems;
    const size_t vec_end = row_elems & ~static_cast<size_t>(15);
    for (size_t i = 0; i < vec_end; ++i) {
      int32_t v = ((r0[i] >> 4) * b0 >> 16) + ((r1[i] >> 4) * b1 >> 16);
      v = (v + 2) >> 2;
      v = v < 0 ? 0 : (v > 255 ? 255 : v);
      // same op order as numpy's (v/255 - 0.5)/0.5 for bit-identical floats
      out[i] = (v / 255.0f - 0.5f) * 2.0f;
    }
    for (size_t i = vec_end; i < row_elems; ++i) {
      int32_t v = (r0[i] * b0 + r1[i] * b1 + kDescaleRound) >> kDescaleBits;
      v = v < 0 ? 0 : (v > 255 ? 255 : v);
      // same op order as numpy's (v/255 - 0.5)/0.5 for bit-identical floats
      out[i] = (v / 255.0f - 0.5f) * 2.0f;
    }
  }
}

// image * (mask < 0.5), HWC uint8 with (h, w) uint8 mask.
void masked_fill_u8(const uint8_t* src, const uint8_t* mask, int h, int w,
                    int c, uint8_t* dst) {
  const size_t n = static_cast<size_t>(h) * w;
  if (c == 3) {  // the hot layout: branch-free RGB
    for (size_t i = 0; i < n; ++i) {
      const uint8_t keep = mask[i] == 0 ? 0xFF : 0;
      dst[i * 3 + 0] = src[i * 3 + 0] & keep;
      dst[i * 3 + 1] = src[i * 3 + 1] & keep;
      dst[i * 3 + 2] = src[i * 3 + 2] & keep;
    }
    return;
  }
  for (size_t i = 0; i < n; ++i) {
    if (mask[i] == 0)
      std::memcpy(dst + i * c, src + i * c, c);
    else
      std::memset(dst + i * c, 0, c);
  }
}

}  // extern "C"
