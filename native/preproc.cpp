// Native host-side image preprocessing for the RadZero-TPU data loader.
//
// The reference's host pipeline leans on PIL + cv2 through Python
// (exp/cxr_pt/model/processing.py, dataset.py collate); this library
// provides the equivalent hot ops as tight C++ loops so the training
// input pipeline keeps the TPU fed:
//
//   - resize_bicubic_u8:   separable Keys bicubic (A = -0.75), the same
//                          align_corners=False coordinate mapping as
//                          radzero_tpu.ops.resize (torch-parity weights)
//   - resize_bilinear_u8:  same mapping, linear kernel
//   - normalize_u8_to_f32: fused rescale(1/255) + per-channel mean/std
//                          normalisation (bit-parity with the Python path)
//   - resize_normalize_u8: fused resize + normalise in one pass over the
//                          intermediate rows (no full-size temporary)
//   - minmax_u8:           cv2.NORM_MINMAX-equivalent rescale to [0,255]
//
// Exposed with C linkage for ctypes (no pybind11 in this environment).
// Build: make -C native  (produces libradzero_preproc.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kA = -0.75;  // torch/OpenCV bicubic coefficient

inline double cubic1(double x) {  // |x| <= 1
  return ((kA + 2.0) * x - (kA + 3.0)) * x * x + 1.0;
}
inline double cubic2(double x) {  // 1 < |x| < 2
  return ((kA * x - 5.0 * kA) * x + 8.0 * kA) * x - 4.0 * kA;
}

struct Tap {
  int idx[4];
  float w[4];
  int n;  // 2 for bilinear, 4 for bicubic
};

// Precompute 1-D interpolation taps for dst -> src with the
// align_corners=False mapping: src = (dst + 0.5) * (in/out) - 0.5.
std::vector<Tap> make_taps(int in_size, int out_size, bool bicubic) {
  std::vector<Tap> taps(out_size);
  const double scale = static_cast<double>(in_size) / out_size;
  for (int o = 0; o < out_size; ++o) {
    double src = (o + 0.5) * scale - 0.5;
    Tap& t = taps[o];
    if (bicubic) {
      double fl = std::floor(src);
      double fr = src - fl;
      int base = static_cast<int>(fl);
      double w[4] = {cubic2(fr + 1.0), cubic1(fr), cubic1(1.0 - fr),
                     cubic2(2.0 - fr)};
      t.n = 4;
      for (int k = 0; k < 4; ++k) {
        t.idx[k] = std::clamp(base - 1 + k, 0, in_size - 1);
        t.w[k] = static_cast<float>(w[k]);
      }
    } else {
      double sc = std::max(src, 0.0);
      int i0 = std::min(static_cast<int>(std::floor(sc)), in_size - 1);
      int i1 = std::min(i0 + 1, in_size - 1);
      double fr = sc - i0;
      t.n = 2;
      t.idx[0] = i0;
      t.idx[1] = i1;
      t.w[0] = static_cast<float>(1.0 - fr);
      t.w[1] = static_cast<float>(fr);
    }
  }
  return taps;
}

inline uint8_t clamp_u8(float v) {
  return static_cast<uint8_t>(std::clamp(v + 0.5f, 0.0f, 255.0f));
}

// Separable resize u8 HWC -> u8 HWC.
void resize_u8(const uint8_t* src, int ih, int iw, int c, uint8_t* dst, int oh,
               int ow, bool bicubic) {
  const auto tx = make_taps(iw, ow, bicubic);
  const auto ty = make_taps(ih, oh, bicubic);

  // horizontal pass: (ih, ow, c) float
  std::vector<float> tmp(static_cast<size_t>(ih) * ow * c);
  for (int y = 0; y < ih; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * iw * c;
    float* trow = tmp.data() + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      const Tap& t = tx[x];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int k = 0; k < t.n; ++k)
          acc += t.w[k] * row[t.idx[k] * c + ch];
        trow[x * c + ch] = acc;
      }
    }
  }
  // vertical pass
  for (int y = 0; y < oh; ++y) {
    const Tap& t = ty[y];
    uint8_t* drow = dst + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow * c; ++x) {
      float acc = 0.f;
      for (int k = 0; k < t.n; ++k)
        acc += t.w[k] * tmp[static_cast<size_t>(t.idx[k]) * ow * c + x];
      drow[x] = clamp_u8(acc);
    }
  }
}

}  // namespace

extern "C" {

void resize_bicubic_u8(const uint8_t* src, int ih, int iw, int c, uint8_t* dst,
                       int oh, int ow) {
  resize_u8(src, ih, iw, c, dst, oh, ow, /*bicubic=*/true);
}

void resize_bilinear_u8(const uint8_t* src, int ih, int iw, int c, uint8_t* dst,
                        int oh, int ow) {
  resize_u8(src, ih, iw, c, dst, oh, ow, /*bicubic=*/false);
}

// dst[h][w][ch] = (src/255 - mean[ch]) / std[ch]
void normalize_u8_to_f32(const uint8_t* src, int h, int w, int c,
                         const float* mean, const float* std_, float* dst) {
  float scale[8], bias[8];
  for (int ch = 0; ch < c && ch < 8; ++ch) {
    scale[ch] = 1.0f / (255.0f * std_[ch]);
    bias[ch] = -mean[ch] / std_[ch];
  }
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    for (int ch = 0; ch < c; ++ch) {
      dst[i * c + ch] = src[i * c + ch] * scale[ch] + bias[ch];
    }
  }
}

// Fused resize (bicubic/bilinear) + normalise: u8 HWC -> f32 HWC.
void resize_normalize_u8(const uint8_t* src, int ih, int iw, int c,
                         float* dst, int oh, int ow, const float* mean,
                         const float* std_, int bicubic) {
  const auto tx = make_taps(iw, ow, bicubic != 0);
  const auto ty = make_taps(ih, oh, bicubic != 0);

  std::vector<float> tmp(static_cast<size_t>(ih) * ow * c);
  for (int y = 0; y < ih; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * iw * c;
    float* trow = tmp.data() + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      const Tap& t = tx[x];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int k = 0; k < t.n; ++k)
          acc += t.w[k] * row[t.idx[k] * c + ch];
        trow[x * c + ch] = acc;
      }
    }
  }
  float scale[8], bias[8];
  for (int ch = 0; ch < c && ch < 8; ++ch) {
    scale[ch] = 1.0f / (255.0f * std_[ch]);
    bias[ch] = -mean[ch] / std_[ch];
  }
  for (int y = 0; y < oh; ++y) {
    const Tap& t = ty[y];
    float* drow = dst + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int k = 0; k < t.n; ++k)
          acc += t.w[k] * tmp[static_cast<size_t>(t.idx[k]) * ow * c + x * c + ch];
        // round-trip through u8 quantisation to match the two-stage
        // (PIL resize -> normalise) reference pipeline exactly
        float q = std::clamp(std::floor(acc + 0.5f), 0.0f, 255.0f);
        drow[x * c + ch] = q * scale[ch] + bias[ch];
      }
    }
  }
}

// cv2.normalize(NORM_MINMAX, 0..255, CV_8U) equivalent.
void minmax_u8(const uint8_t* src, int n, uint8_t* dst) {
  uint8_t lo = 255, hi = 0;
  for (int i = 0; i < n; ++i) {
    lo = std::min(lo, src[i]);
    hi = std::max(hi, src[i]);
  }
  if (hi == lo) {
    std::memset(dst, 0, n);
    return;
  }
  const float s = 255.0f / (hi - lo);
  for (int i = 0; i < n; ++i) {
    dst[i] = clamp_u8((src[i] - lo) * s);
  }
}
}  // extern "C"

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) + fully fused decode->resize->normalise hot path
// ---------------------------------------------------------------------------
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_rgb(const uint8_t* data, int len, std::vector<uint8_t>& pixels,
                int* h, int* w, int min_h = 0, int min_w = 0,
                bool grayscale = false) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = grayscale ? JCS_GRAYSCALE : JCS_RGB;
  // scaled decoding: pick the largest 1/d (d in {1,2,4,8}) whose output
  // still covers the resize target - cuts IDCT cost up to ~8x
  if (min_h > 0 && min_w > 0) {
    int denom = 1;
    for (int d = 2; d <= 8; d *= 2) {
      if (static_cast<int>(cinfo.image_height) / d >= min_h &&
          static_cast<int>(cinfo.image_width) / d >= min_w) {
        denom = d;
      }
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  const int comps = cinfo.output_components;
  pixels.resize(static_cast<size_t>(*h) * *w * comps);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row =
        pixels.data() + static_cast<size_t>(cinfo.output_scanline) * *w * comps;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

}  // namespace

extern "C" {

// Probe dimensions only. Returns 0 on success.
int jpeg_dims(const uint8_t* data, int len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode to RGB u8 HWC into caller buffer of capacity cap bytes. 0 = ok.
int decode_jpeg_rgb(const uint8_t* data, int len, uint8_t* out, long cap,
                    int* h, int* w) {
  std::vector<uint8_t> px;
  if (!decode_rgb(data, len, px, h, w)) return 1;
  if (static_cast<long>(px.size()) > cap) return 2;
  std::memcpy(out, px.data(), px.size());
  return 0;
}

// The full data-loader hot path in one call:
// JPEG bytes -> RGB -> resize (oh, ow) -> rescale+normalise f32 HWC. 0 = ok.
int decode_resize_normalize_jpeg(const uint8_t* data, int len, float* dst,
                                 int oh, int ow, const float* mean,
                                 const float* std_, int bicubic,
                                 int fast_scale) {
  std::vector<uint8_t> px;
  int h = 0, w = 0;
  if (!decode_rgb(data, len, px, &h, &w, fast_scale ? oh : 0,
                  fast_scale ? ow : 0)) return 1;
  resize_normalize_u8(px.data(), h, w, 3, dst, oh, ow, mean, std_, bicubic);
  return 0;
}

// Serving hot path for the uint8-upload scheme: JPEG bytes -> RGB ->
// resize (oh, ow) -> u8 HWC. Normalisation happens ON DEVICE (fused by
// XLA into the patch-embed conv), so the host->device transfer is 4x
// smaller than the f32 variant. 0 = ok.
int decode_resize_jpeg_u8(const uint8_t* data, int len, uint8_t* dst,
                          int oh, int ow, int bicubic, int fast_scale) {
  std::vector<uint8_t> px;
  int h = 0, w = 0;
  if (!decode_rgb(data, len, px, &h, &w, fast_scale ? oh : 0,
                  fast_scale ? ow : 0)) return 1;
  resize_u8(px.data(), h, w, 3, dst, oh, ow, bicubic != 0);
  return 0;
}

// Grayscale variant: JPEG -> luma (libjpeg JCS_GRAYSCALE: BT.601 from
// YCbCr, i.e. the Y plane directly for single-component CXR JPEGs) ->
// resize -> u8 (oh, ow, 1). 3x fewer bytes host->device than RGB;
// channel replication happens on device. 0 = ok.
int decode_resize_jpeg_gray_u8(const uint8_t* data, int len, uint8_t* dst,
                               int oh, int ow, int bicubic, int fast_scale) {
  std::vector<uint8_t> px;
  int h = 0, w = 0;
  if (!decode_rgb(data, len, px, &h, &w, fast_scale ? oh : 0,
                  fast_scale ? ow : 0, /*grayscale=*/true)) return 1;
  resize_u8(px.data(), h, w, 1, dst, oh, ow, bicubic != 0);
  return 0;
}
}  // extern "C"
