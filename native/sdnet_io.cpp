// sdnet_io: native host-side input pipeline for structuredetector-tpu.
//
// The reference delegates image IO to PIL inside torch DataLoader worker
// processes (reference dataset.py:41-49, trainer.py:62-87). This library
// is the TPU-native replacement for the host side of that path: a fused
// JPEG/PNG decode -> scaled decode -> bilinear resize -> (optional flip)
// -> ImageNet normalize pipeline in C++, plus a std::thread batch loader
// that fills one contiguous NHWC float32 batch buffer (ready for a single
// host->HBM transfer).
//
// Key speed levers:
//  - libjpeg DCT-space scaled decode (scale 1/1..1/8): a 2448x2048 photo
//    headed for 512x512 is decoded at ~1/4 resolution, ~10x less work,
//  - one pass fuses resize + normalize (and flips via index mirroring),
//  - per-image threads with no GIL involvement; Python only sees the
//    filled batch buffer.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <jerror.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, 8-bit
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
  bool truncated = false;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

// Corrupt-data warnings: only premature EOF (JWRN_JPEG_EOF — libjpeg
// pads a truncated stream with fake EOI and "succeeds" with a half-gray
// image) must fail the decode, matching PIL's load() which raises on
// truncation but decodes fine through benign warnings like "extraneous
// bytes before marker" (common camera output). Overriding emit_message
// also silences the default stderr chatter.
void jpeg_emit_message(j_common_ptr cinfo, int msg_level) {
  if (msg_level < 0) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    if (cinfo->err->msg_code == JWRN_JPEG_EOF) err->truncated = true;
  }
}

bool decode_jpeg(const char* path, int target_w, int target_h, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  jerr.mgr.emit_message = jpeg_emit_message;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  // Pick the largest DCT downscale that still covers the target.
  if (target_w > 0 && target_h > 0) {
    int denom = 1;
    while (denom < 8 && (int)cinfo.image_width / (denom * 2) >= target_w &&
           (int)cinfo.image_height / (denom * 2) >= target_h) {
      denom *= 2;
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = cinfo.output_components;  // 3 for RGB
  out->data.resize((size_t)out->w * out->h * out->c);

  const size_t stride = (size_t)out->w * out->c;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // libjpeg treats premature EOF (truncated file) as a *warning* and
  // fakes an EOI marker, so error_exit never fires and the decode
  // "succeeds" with a half-gray image. PIL raises on the same input;
  // match it by failing on truncation (see jpeg_emit_message).
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return out->c == 3 && !jerr.truncated;
}

// In-memory JPEG decode (the serving request path: the payload is
// already in RAM, so no FILE* round-trip). Reports the ORIGINAL size
// via cinfo.image_width/height even when DCT-downscaling the output.
bool decode_jpeg_mem(const uint8_t* buf, size_t len, int target_w,
                     int target_h, Image* out, int* orig_w, int* orig_h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  jerr.mgr.emit_message = jpeg_emit_message;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  if (orig_w) { *orig_w = cinfo.image_width; *orig_h = cinfo.image_height; }

  if (target_w > 0 && target_h > 0) {
    int denom = 1;
    while (denom < 8 && (int)cinfo.image_width / (denom * 2) >= target_w &&
           (int)cinfo.image_height / (denom * 2) >= target_h) {
      denom *= 2;
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = cinfo.output_components;
  out->data.resize((size_t)out->w * out->h * out->c);

  const size_t stride = (size_t)out->w * out->c;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // Truncated payloads reach here "successfully": libjpeg raises only
  // a warning (JWRN_JPEG_EOF) and pads with fake EOI. The serving path
  // guarantees 400 on truncation (serve.make_request_decoder), so a
  // truncation warning must fail the decode like PIL's load() does
  // (benign warnings pass — see jpeg_emit_message).
  jpeg_destroy_decompress(&cinfo);
  return out->c == 3 && !jerr.truncated;
}

struct PngMemCursor {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  PngMemCursor* cur = (PngMemCursor*)png_get_io_ptr(png);
  if (cur->pos + n > cur->len) png_error(png, "png: truncated buffer");
  std::memcpy(out, cur->buf + cur->pos, n);
  cur->pos += n;
}

bool decode_png_mem(const uint8_t* buf, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  PngMemCursor cur{buf, len, 8};
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_set_read_fn(png, &cur, png_mem_read);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize((size_t)out->w * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; y++)
    rows[y] = out->data.data() + (size_t)y * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_png(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(f);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize((size_t)out->w * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; y++)
    rows[y] = out->data.data() + (size_t)y * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return true;
}

bool ends_with(const std::string& s, const char* suf) {
  std::string lower = s;
  std::transform(lower.begin(), lower.end(), lower.begin(), ::tolower);
  std::string t(suf);
  return lower.size() >= t.size() && lower.compare(lower.size() - t.size(), t.size(), t) == 0;
}

// ---------------------------------------------------------------------
// PIL-compatible resampling (exact mode).
//
// Reproduces Pillow's BILINEAR resize semantics so the native tier is
// bit-identical to the PIL host path (strict eval parity): a separable
// two-pass triangle filter whose support scales with the downscale
// factor, coefficients quantized to 2^22 fixed point with
// round-half-away, each pass accumulating in int32 with a rounding bias
// and clamping back to uint8.
// ---------------------------------------------------------------------

constexpr int kPrecisionBits = 32 - 8 - 2;

inline uint8_t clip8(int v) {
  v >>= kPrecisionBits;
  return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// Triangle-filter coefficient table for one axis: per output index,
// bounds[2*i] = first source index, bounds[2*i+1] = tap count; taps in
// kk[i*ksize ..]. Returns ksize.
int precompute_coeffs(int in_size, int out_size, std::vector<int>* bounds,
                      std::vector<int>* kk) {
  const double scale = (double)in_size / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = filterscale;  // bilinear filter support = 1.0
  const int ksize = (int)std::ceil(support) * 2 + 1;

  bounds->assign((size_t)out_size * 2, 0);
  kk->assign((size_t)out_size * ksize, 0);
  std::vector<double> k(ksize);

  for (int xx = 0; xx < out_size; xx++) {
    const double center = (xx + 0.5) * scale;
    const double ss = 1.0 / filterscale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;

    double ww = 0.0;
    for (int x = 0; x < xmax; x++) {
      double t = (x + xmin - center + 0.5) * ss;
      if (t < 0) t = -t;
      const double w = t < 1.0 ? 1.0 - t : 0.0;
      k[x] = w;
      ww += w;
    }
    int* ki = kk->data() + (size_t)xx * ksize;
    for (int x = 0; x < xmax; x++) {
      const double c = ww != 0.0 ? k[x] / ww : 0.0;
      const double q = c * (1 << kPrecisionBits);
      ki[x] = (int)(q < 0 ? q - 0.5 : q + 0.5);
    }
    (*bounds)[xx * 2] = xmin;
    (*bounds)[xx * 2 + 1] = xmax;
  }
  return ksize;
}

// Two-pass uint8 resample, horizontal then vertical (each pass rounds
// back to uint8 like Pillow does). Layout tuned for throughput while
// keeping the integer math bit-identical to Pillow:
//  - per-axis identity skip: at scale 1.0 the triangle filter is
//    exactly [1] after normalization (coeff 1<<22; bias then truncates
//    back to the source byte), so same-size axes are pure copies —
//    the common case for serving, where inputs arrive pre-sized;
//  - horizontal pass keeps the 3 channel accumulators in registers and
//    walks the taps with one pointer bump instead of re-indexing;
//  - vertical pass streams whole rows into an int32 accumulator row
//    (contiguous uint8*int32 multiply-accumulate auto-vectorizes),
//    instead of gathering a strided column per output pixel.
// Measured (512x512 source, -O3 -march=native, 1 core): same-size
// 28.8 -> 0.1 ms, downscale-to-448 11.8 -> 5.4 ms, upscale-to-576
// 50.7 -> 10.0 ms; pinned bit-exact vs both the prior code and PIL
// (tests/test_native_io.py).
void resample_pil(const Image& img, int out_w, int out_h, Image* out) {
  const bool h_id = (out_w == img.w);
  const bool v_id = (out_h == img.h);
  if (h_id && v_id) {
    *out = img;
    return;
  }

  std::vector<int> hb, hk, vb, vk;
  int hks = 0, vks = 0;
  if (!h_id) hks = precompute_coeffs(img.w, out_w, &hb, &hk);
  if (!v_id) vks = precompute_coeffs(img.h, out_h, &vb, &vk);

  const Image* hsrc = &img;
  Image tmp;
  if (!h_id) {
    tmp.w = out_w;
    tmp.h = img.h;
    tmp.c = 3;
    tmp.data.resize((size_t)out_w * img.h * 3);
    for (int y = 0; y < img.h; y++) {
      const uint8_t* src = img.data.data() + (size_t)y * img.w * 3;
      uint8_t* dst = tmp.data.data() + (size_t)y * out_w * 3;
      for (int xx = 0; xx < out_w; xx++) {
        const int xmin = hb[xx * 2], xmax = hb[xx * 2 + 1];
        const int* ki = hk.data() + (size_t)xx * hks;
        const uint8_t* sp = src + (size_t)xmin * 3;
        int s0 = 1 << (kPrecisionBits - 1), s1 = s0, s2 = s0;
        for (int x = 0; x < xmax; x++) {
          const int k = ki[x];
          s0 += sp[0] * k;
          s1 += sp[1] * k;
          s2 += sp[2] * k;
          sp += 3;
        }
        dst[(size_t)xx * 3] = clip8(s0);
        dst[(size_t)xx * 3 + 1] = clip8(s1);
        dst[(size_t)xx * 3 + 2] = clip8(s2);
      }
    }
    hsrc = &tmp;
  }

  if (v_id) {
    *out = *hsrc;
    return;
  }

  out->w = hsrc->w;
  out->h = out_h;
  out->c = 3;
  out->data.resize((size_t)hsrc->w * out_h * 3);
  const size_t row_elems = (size_t)hsrc->w * 3;
  std::vector<int> acc(row_elems);
  for (int yy = 0; yy < out_h; yy++) {
    const int ymin = vb[yy * 2], ymax = vb[yy * 2 + 1];
    const int* ki = vk.data() + (size_t)yy * vks;
    std::fill(acc.begin(), acc.end(), 1 << (kPrecisionBits - 1));
    for (int y = 0; y < ymax; y++) {
      const int k = ki[y];
      const uint8_t* row = hsrc->data.data() + (size_t)(ymin + y) * row_elems;
      int* a = acc.data();
      for (size_t i = 0; i < row_elems; i++) a[i] += row[i] * k;
    }
    uint8_t* dst = out->data.data() + (size_t)yy * row_elems;
    for (size_t i = 0; i < row_elems; i++) dst[i] = clip8(acc[i]);
  }
}

// uint8 resampled image -> flipped, [0,1]-scaled, normalized float32,
// with the exact float op sequence of the host path
// (data/augment.py Normalize: f32(u8) / 255.0, then (v - mean) / std).
void finalize_exact(const Image& img, bool hflip, bool vflip,
                    const float* mean, const float* stdv, float* out) {
  for (int oy = 0; oy < img.h; oy++) {
    const int ty = vflip ? (img.h - 1 - oy) : oy;
    float* dst = out + (size_t)oy * img.w * 3;
    const uint8_t* src = img.data.data() + (size_t)ty * img.w * 3;
    for (int ox = 0; ox < img.w; ox++) {
      const int tx = hflip ? (img.w - 1 - ox) : ox;
      for (int ch = 0; ch < 3; ch++) {
        const float v = (float)src[(size_t)tx * 3 + ch] / 255.0f;
        dst[(size_t)ox * 3 + ch] = (v - mean[ch]) / stdv[ch];
      }
    }
  }
}

// Fused bilinear resize + flip + normalize: uint8 HWC -> float32 HWC.
// (fast mode: 2-tap bilinear at pixel centers, multiply-by-reciprocal —
// close to but not bit-identical with PIL)
void resize_normalize(const Image& img, int out_w, int out_h, bool hflip,
                      bool vflip, const float* mean, const float* stdv,
                      float* out) {
  const float sx = (float)img.w / out_w;
  const float sy = (float)img.h / out_h;
  const float inv255 = 1.0f / 255.0f;
  const float inv_std[3] = {1.0f / stdv[0], 1.0f / stdv[1], 1.0f / stdv[2]};

  for (int oy = 0; oy < out_h; oy++) {
    const int ty = vflip ? (out_h - 1 - oy) : oy;
    // PIL-style bilinear: sample at pixel centers.
    float fy = (ty + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, (float)img.h - 1));
    const int y0 = (int)fy;
    const int y1 = std::min(y0 + 1, img.h - 1);
    const float wy = fy - y0;

    float* dst = out + (size_t)oy * out_w * 3;
    for (int ox = 0; ox < out_w; ox++) {
      const int tx = hflip ? (out_w - 1 - ox) : ox;
      float fx = (tx + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, (float)img.w - 1));
      const int x0 = (int)fx;
      const int x1 = std::min(x0 + 1, img.w - 1);
      const float wx = fx - x0;

      const uint8_t* p00 = img.data.data() + ((size_t)y0 * img.w + x0) * 3;
      const uint8_t* p01 = img.data.data() + ((size_t)y0 * img.w + x1) * 3;
      const uint8_t* p10 = img.data.data() + ((size_t)y1 * img.w + x0) * 3;
      const uint8_t* p11 = img.data.data() + ((size_t)y1 * img.w + x1) * 3;

      for (int ch = 0; ch < 3; ch++) {
        const float top = p00[ch] + (p01[ch] - p00[ch]) * wx;
        const float bot = p10[ch] + (p11[ch] - p10[ch]) * wx;
        const float v = (top + (bot - top) * wy) * inv255;
        dst[ox * 3 + ch] = (v - mean[ch]) * inv_std[ch];
      }
    }
  }
}

// Decode the source image (full-resolution in exact mode, largest safe
// DCT downscale in fast mode) and report the file's true size.
bool decode_source(const char* path, int out_w, int out_h, bool exact,
                   Image* img, int* orig_w, int* orig_h) {
  const std::string p(path);
  if (ends_with(p, ".png")) {
    if (!decode_png(path, img)) return false;
    if (orig_w) { *orig_w = img->w; *orig_h = img->h; }
    return true;
  }
  // JPEG path reports the pre-scaled original size.
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  if (orig_w) { *orig_w = cinfo.image_width; *orig_h = cinfo.image_height; }
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  // exact mode decodes at full resolution (DCT-scaled decode changes
  // pixels vs PIL's full decode); fast mode picks the largest safe
  // DCT downscale.
  return decode_jpeg(path, exact ? 0 : out_w, exact ? 0 : out_h, img);
}

// Memory-source analog of decode_source: format sniffed from magic
// bytes (PNG signature / JPEG SOI), original size always reported.
bool decode_source_mem(const uint8_t* buf, size_t len, int out_w, int out_h,
                       bool exact, Image* img, int* orig_w, int* orig_h) {
  if (len >= 8 && !png_sig_cmp(buf, 0, 8)) {
    if (!decode_png_mem(buf, len, img)) return false;
    if (orig_w) { *orig_w = img->w; *orig_h = img->h; }
    return true;
  }
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    // exact mode decodes at full resolution (parity with PIL); fast
    // mode picks the largest safe DCT downscale
    return decode_jpeg_mem(buf, len, exact ? 0 : out_w, exact ? 0 : out_h,
                           img, orig_w, orig_h);
  }
  return false;
}

bool load_one(const char* path, int out_w, int out_h, bool hflip, bool vflip,
              const float* mean, const float* stdv, float* out,
              int* orig_w, int* orig_h, bool exact) {
  Image img;
  if (!decode_source(path, out_w, out_h, exact, &img, orig_w, orig_h))
    return false;
  if (exact) {
    Image resized;
    resample_pil(img, out_w, out_h, &resized);
    finalize_exact(resized, hflip, vflip, mean, stdv, out);
  } else {
    resize_normalize(img, out_w, out_h, hflip, vflip, mean, stdv, out);
  }
  return true;
}

// uint8 resampled image -> flipped uint8 copy (no float conversion).
void finalize_u8(const Image& img, bool hflip, bool vflip, uint8_t* out) {
  for (int oy = 0; oy < img.h; oy++) {
    const int ty = vflip ? (img.h - 1 - oy) : oy;
    uint8_t* dst = out + (size_t)oy * img.w * 3;
    const uint8_t* src = img.data.data() + (size_t)ty * img.w * 3;
    if (!hflip) {
      std::memcpy(dst, src, (size_t)img.w * 3);
      continue;
    }
    for (int ox = 0; ox < img.w; ox++) {
      const uint8_t* s = src + (size_t)(img.w - 1 - ox) * 3;
      dst[(size_t)ox * 3] = s[0];
      dst[(size_t)ox * 3 + 1] = s[1];
      dst[(size_t)ox * 3 + 2] = s[2];
    }
  }
}

// Fast-mode 2-tap bilinear resize + flip straight to uint8 (round to
// nearest) — the uint8-feed analog of resize_normalize.
void resize_u8(const Image& img, int out_w, int out_h, bool hflip,
               bool vflip, uint8_t* out) {
  const float sx = (float)img.w / out_w;
  const float sy = (float)img.h / out_h;
  for (int oy = 0; oy < out_h; oy++) {
    const int ty = vflip ? (out_h - 1 - oy) : oy;
    float fy = (ty + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, (float)img.h - 1));
    const int y0 = (int)fy;
    const int y1 = std::min(y0 + 1, img.h - 1);
    const float wy = fy - y0;

    uint8_t* dst = out + (size_t)oy * out_w * 3;
    for (int ox = 0; ox < out_w; ox++) {
      const int tx = hflip ? (out_w - 1 - ox) : ox;
      float fx = (tx + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, (float)img.w - 1));
      const int x0 = (int)fx;
      const int x1 = std::min(x0 + 1, img.w - 1);
      const float wx = fx - x0;

      const uint8_t* p00 = img.data.data() + ((size_t)y0 * img.w + x0) * 3;
      const uint8_t* p01 = img.data.data() + ((size_t)y0 * img.w + x1) * 3;
      const uint8_t* p10 = img.data.data() + ((size_t)y1 * img.w + x0) * 3;
      const uint8_t* p11 = img.data.data() + ((size_t)y1 * img.w + x1) * 3;

      for (int ch = 0; ch < 3; ch++) {
        const float top = p00[ch] + (p01[ch] - p00[ch]) * wx;
        const float bot = p10[ch] + (p11[ch] - p10[ch]) * wx;
        const float v = top + (bot - top) * wy;
        const int q = (int)(v + 0.5f);
        dst[ox * 3 + ch] = (uint8_t)(q < 0 ? 0 : (q > 255 ? 255 : q));
      }
    }
  }
}

// uint8-output variant of load_one: raw resized pixels, no normalize —
// the feed for on-device /255 + normalization (4x smaller host->device
// transfer than the float32 feed).
bool load_one_u8(const char* path, int out_w, int out_h, bool hflip,
                 bool vflip, uint8_t* out, int* orig_w, int* orig_h,
                 bool exact) {
  Image img;
  if (!decode_source(path, out_w, out_h, exact, &img, orig_w, orig_h))
    return false;
  if (exact) {
    Image resized;
    resample_pil(img, out_w, out_h, &resized);
    finalize_u8(resized, hflip, vflip, out);
  } else {
    resize_u8(img, out_w, out_h, hflip, vflip, out);
  }
  return true;
}

}  // namespace

extern "C" {

// Decode one image into a caller-provided (out_h, out_w, 3) float32 buffer.
// Returns 1 on success. orig_w/orig_h receive the file's true size.
// exact != 0: bit-identical with the PIL host path (full decode +
// Pillow-semantics resample); exact == 0: fast approximate path
// (DCT-scaled decode + 2-tap bilinear).
int sdnet_load_image(const char* path, int out_w, int out_h, int hflip,
                     int vflip, const float* mean, const float* stdv,
                     float* out, int* orig_w, int* orig_h, int exact) {
  return load_one(path, out_w, out_h, hflip != 0, vflip != 0, mean, stdv, out,
                  orig_w, orig_h, exact != 0)
             ? 1
             : 0;
}

// Threaded batch load: n images into one contiguous (n, out_h, out_w, 3)
// buffer. flips: per-image 2-int pairs (hflip, vflip), may be null.
// ok: per-image success flags (len n). Returns count of successes.
int sdnet_load_batch(const char** paths, int n, int out_w, int out_h,
                     const int* flips, const float* mean, const float* stdv,
                     float* out, int* orig_sizes, int* ok, int n_threads,
                     int exact) {
  if (n_threads <= 0) n_threads = 4;
  n_threads = std::min(n_threads, n);
  std::atomic<int> next(0), good(0);
  const size_t stride = (size_t)out_w * out_h * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const bool hf = flips && flips[i * 2];
      const bool vf = flips && flips[i * 2 + 1];
      int ow = 0, oh = 0;
      const int r = load_one(paths[i], out_w, out_h, hf, vf, mean, stdv,
                             out + stride * i, &ow, &oh, exact != 0)
                        ? 1
                        : 0;
      if (ok) ok[i] = r;
      if (orig_sizes) {
        orig_sizes[i * 2] = ow;
        orig_sizes[i * 2 + 1] = oh;
      }
      if (r) good.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

// uint8-output variants: raw resized pixels (identical to the uint8
// intermediate of the float path), no normalization — callers divide by
// 255 and normalize on device. Signatures mirror the float versions
// minus mean/std.
int sdnet_load_image_u8(const char* path, int out_w, int out_h, int hflip,
                        int vflip, uint8_t* out, int* orig_w, int* orig_h,
                        int exact) {
  return load_one_u8(path, out_w, out_h, hflip != 0, vflip != 0, out,
                     orig_w, orig_h, exact != 0)
             ? 1
             : 0;
}

int sdnet_load_batch_u8(const char** paths, int n, int out_w, int out_h,
                        const int* flips, uint8_t* out, int* orig_sizes,
                        int* ok, int n_threads, int exact) {
  if (n_threads <= 0) n_threads = 4;
  n_threads = std::min(n_threads, n);
  std::atomic<int> next(0), good(0);
  const size_t stride = (size_t)out_w * out_h * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const bool hf = flips && flips[i * 2];
      const bool vf = flips && flips[i * 2 + 1];
      int ow = 0, oh = 0;
      const int r = load_one_u8(paths[i], out_w, out_h, hf, vf,
                                out + stride * i, &ow, &oh, exact != 0)
                        ? 1
                        : 0;
      if (ok) ok[i] = r;
      if (orig_sizes) {
        orig_sizes[i * 2] = ow;
        orig_sizes[i * 2 + 1] = oh;
      }
      if (r) good.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

// In-memory decode (the serving request path: payload bytes -> resized
// network-input pixels with no tempfile). Format sniffed from magic
// bytes. Returns 1 on success; orig_w/orig_h receive the true size.
int sdnet_decode_mem(const uint8_t* buf, long len, int out_w, int out_h,
                     const float* mean, const float* stdv, float* out,
                     int* orig_w, int* orig_h, int exact) {
  Image img;
  if (!decode_source_mem(buf, (size_t)len, out_w, out_h, exact != 0, &img,
                         orig_w, orig_h))
    return 0;
  if (exact != 0) {
    Image resized;
    resample_pil(img, out_w, out_h, &resized);
    finalize_exact(resized, false, false, mean, stdv, out);
  } else {
    resize_normalize(img, out_w, out_h, false, false, mean, stdv, out);
  }
  return 1;
}

// uint8-output variant: raw resized pixels (the on-device-normalize feed).
int sdnet_decode_mem_u8(const uint8_t* buf, long len, int out_w, int out_h,
                        uint8_t* out, int* orig_w, int* orig_h, int exact) {
  Image img;
  if (!decode_source_mem(buf, (size_t)len, out_w, out_h, exact != 0, &img,
                         orig_w, orig_h))
    return 0;
  if (exact != 0) {
    Image resized;
    resample_pil(img, out_w, out_h, &resized);
    finalize_u8(resized, false, false, out);
  } else {
    resize_u8(img, out_w, out_h, false, false, out);
  }
  return 1;
}

int sdnet_io_version() { return 4; }  // v4: in-memory decode (serving path)

}  // extern "C"
