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
//   jpeg_probe_u8 / jpeg_decode_u8: JPEG blob -> uint8 HWC via the system
//       libjpeg-turbo (the same codec cv2.imdecode uses, reference
//       train_diffute_v1.py:390-396), with cv2's channel-order semantics
//       (RGB or JCS_EXT_BGR) and gray->RGB promotion.  Compiled only when
//       HOSTOPS_HAVE_JPEG is defined (the loader links -ljpeg then); the
//       Python side falls back to cv2 when the symbols are absent or a
//       blob is not a decodable 1/3-component JPEG (e.g. CMYK).
//       Glyph rasterization stays on PIL/FreeType: this image ships
//       libfreetype.so but no FreeType headers, and hand-declaring its
//       struct layouts would be version-fragile for zero hot-path gain
//       (renders are LRU-cached in text/glyph.py).
//
// Build: cc -O3 -march=native -shared -fPIC hostops.cpp -o libhostops.so
//        [-DHOSTOPS_HAVE_JPEG -ljpeg]
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

#ifdef HOSTOPS_HAVE_JPEG

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>

namespace {

// libjpeg's default error handler exit()s the process; route fatal errors
// through longjmp so a corrupt blob returns an error code instead of
// killing the trainer (the data loader substitutes another example,
// io/dataset.py "substitute-on-decode-error").
struct JpegErrorJump {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit_longjmp(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErrorJump*>(cinfo->err)->jump, 1);
}

void jpeg_emit_nothing(j_common_ptr, int) {}

bool jpeg_setup(jpeg_decompress_struct* cinfo, JpegErrorJump* err,
                const unsigned char* buf, unsigned long len) {
  cinfo->err = jpeg_std_error(&err->mgr);
  err->mgr.error_exit = jpeg_error_exit_longjmp;
  err->mgr.emit_message = jpeg_emit_nothing;  // no stderr warning spam
  jpeg_create_decompress(cinfo);
  jpeg_mem_src(cinfo, buf, len);
  return jpeg_read_header(cinfo, TRUE) == JPEG_HEADER_OK;
}

}  // namespace

extern "C" {

// Parse the header only: fills (h, w); returns 0 on success, 1 if the blob
// is not a JPEG this decoder handles (callers fall back to cv2/PIL).
int jpeg_probe_u8(const unsigned char* buf, unsigned long len,
                  int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErrorJump err;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  if (!jpeg_setup(&cinfo, &err, buf, len)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  // Only grayscale/YCbCr/RGB sources convert to RGB in libjpeg; CMYK/YCCK
  // (rare scanner output) must take the cv2/PIL path.
  const bool ok = cinfo.jpeg_color_space == JCS_GRAYSCALE ||
                  cinfo.jpeg_color_space == JCS_YCbCr ||
                  cinfo.jpeg_color_space == JCS_RGB;
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return ok ? 0 : 1;
}

// Full decode into caller-allocated out (h*w*3 bytes, HWC).  bgr != 0 emits
// cv2.imdecode(flags=1) channel order (JCS_EXT_BGR); otherwise RGB.
// Returns 0 on success, 1 on any decode error (out contents undefined).
int jpeg_decode_u8(const unsigned char* buf, unsigned long len,
                   unsigned char* out, int expected_h, int expected_w,
                   int bgr) {
  jpeg_decompress_struct cinfo;
  JpegErrorJump err;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  if (!jpeg_setup(&cinfo, &err, buf, len)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = bgr ? JCS_EXT_BGR : JCS_RGB;
  if (!jpeg_start_decompress(&cinfo) ||
      static_cast<int>(cinfo.output_height) != expected_h ||
      static_cast<int>(cinfo.output_width) != expected_w ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  const size_t stride = static_cast<size_t>(expected_w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + cinfo.output_scanline * stride;
    if (jpeg_read_scanlines(&cinfo, &row, 1) != 1) {
      jpeg_destroy_decompress(&cinfo);
      return 1;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"

#endif  // HOSTOPS_HAVE_JPEG
