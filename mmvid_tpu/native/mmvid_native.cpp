// mmvid_tpu native data-loader core.
//
// The reference leans on decord (a C++ FFmpeg wrapper) for video decode
// (reference mmvid_pytorch/loader.py:12-13); MMVID's frame-folder datasets
// spend their host time in image decode + resize + float conversion.  This
// library provides that hot path natively: libjpeg/libpng decode, a
// Pillow-compatible separable triangle-filter resize (so outputs match the
// Python fallback bit-for-bit within float rounding), [0,1] float
// normalization, and a std::thread batch loader.
//
// C ABI (ctypes-friendly):
//   mmvid_image_dims(path, &h, &w)             -> 0 ok
//   mmvid_load_image(path, out_h, out_w, out)  -> decode+resize+normalize
//   mmvid_load_batch(paths, n, out_h, out_w, out, n_threads)
//   mmvid_resize_normalize(src,u8 h,w -> dst,f32 oh,ow)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
};

// ---------------------------------------------------------------- JPEG
struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = 3;
  out->data.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG
bool decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA ||
      png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = int(h);
  out->w = int(w);
  out->c = 3;
  out->data.resize(size_t(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && !memcmp(magic, "\x89PNG\r\n\x1a\n", 8)) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// ----------------------------------------------- Pillow-style resampling
// Separable triangle (bilinear) filter with support scaled for
// downsampling — identical math to Pillow's ImagingResample BILINEAR.
struct Coeffs {
  std::vector<int> bounds;      // (xmin, xsize) per output pixel
  std::vector<double> weights;  // ksize weights per output pixel
  int ksize = 0;
};

Coeffs precompute(int in_size, int out_size) {
  Coeffs co;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // bilinear support = 1
  co.ksize = int(std::ceil(support)) * 2 + 1;
  co.bounds.resize(size_t(out_size) * 2);
  co.weights.resize(size_t(out_size) * co.ksize);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    int n = xmax - xmin;
    double* k = &co.weights[size_t(i) * co.ksize];
    double total = 0.0;
    for (int x = 0; x < n; ++x) {
      double arg = (x + xmin - center + 0.5) / filterscale;
      double wv = arg < 0 ? 1.0 + arg : 1.0 - arg;  // triangle
      if (wv < 0) wv = 0;
      k[x] = wv;
      total += wv;
    }
    if (total > 0)
      for (int x = 0; x < n; ++x) k[x] /= total;
    co.bounds[size_t(i) * 2] = xmin;
    co.bounds[size_t(i) * 2 + 1] = n;
  }
  return co;
}

void resize_normalize(const uint8_t* src, int h, int w, float* dst, int oh,
                      int ow) {
  Coeffs cx = precompute(w, ow);
  Coeffs cy = precompute(h, oh);
  // horizontal pass: [h, ow, 3] floats
  std::vector<float> tmp(size_t(h) * ow * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + size_t(y) * w * 3;
    float* orow = tmp.data() + size_t(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      int xmin = cx.bounds[size_t(x) * 2];
      int n = cx.bounds[size_t(x) * 2 + 1];
      const double* k = &cx.weights[size_t(x) * cx.ksize];
      double acc0 = 0, acc1 = 0, acc2 = 0;
      for (int j = 0; j < n; ++j) {
        const uint8_t* p = row + size_t(xmin + j) * 3;
        acc0 += p[0] * k[j];
        acc1 += p[1] * k[j];
        acc2 += p[2] * k[j];
      }
      orow[x * 3 + 0] = float(acc0);
      orow[x * 3 + 1] = float(acc1);
      orow[x * 3 + 2] = float(acc2);
    }
  }
  // vertical pass + [0,1] normalization
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < oh; ++y) {
    int ymin = cy.bounds[size_t(y) * 2];
    int n = cy.bounds[size_t(y) * 2 + 1];
    const double* k = &cy.weights[size_t(y) * cy.ksize];
    float* orow = dst + size_t(y) * ow * 3;
    for (int x = 0; x < ow * 3; ++x) {
      double acc = 0;
      for (int j = 0; j < n; ++j)
        acc += tmp[size_t(ymin + j) * ow * 3 + x] * k[j];
      // Pillow rounds resized uint8 output before float conversion
      double v = acc < 0 ? 0 : (acc > 255 ? 255 : acc);
      orow[x] = float(int(v + 0.5)) * inv255;
    }
  }
}

}  // namespace

extern "C" {

int mmvid_image_dims(const char* path, int* h, int* w) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  *h = img.h;
  *w = img.w;
  return 0;
}

int mmvid_load_image(const char* path, int out_h, int out_w, float* out) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  resize_normalize(img.data.data(), img.h, img.w, out, out_h, out_w);
  return 0;
}

void mmvid_resize_normalize(const uint8_t* src, int h, int w, float* dst,
                            int oh, int ow) {
  resize_normalize(src, h, w, dst, oh, ow);
}

int mmvid_load_batch(const char** paths, int n, int out_h, int out_w,
                     float* out, int n_threads) {
  std::atomic<int> next(0), failed(0);
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (mmvid_load_image(paths[i], out_h, out_w,
                           out + size_t(i) * out_h * out_w * 3) != 0)
        failed.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
