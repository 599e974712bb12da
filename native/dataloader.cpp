// Native data-loading runtime: JPEG/PNG decode + crop/resize, C ABI.
//
// The reference's data path is 8 torch DataLoader worker *processes* doing
// cv2.imread + augmentation per sample (SURVEY.md §3.1 "PROCESS BOUNDARY").
// This framework moves augmentation on-device; what remains host-side is
// decode + resize + batch assembly, implemented here as a native library so
// the Python loop never touches pixels: Python passes paths and a
// preallocated uint8 batch buffer, C++ fills it with a thread pool.
//
// Exposed C ABI (ctypes-friendly, no C++ types across the boundary):
//   d3f_decode_image(path, target_size, out_buf) -> 0 on success
//   d3f_load_batch(paths, n, target_size, n_threads, out_buf, err_idx) -> 0/-1
//   d3f_image_dims(path, &w, &h) -> 0 on success
//
// Decode: libjpeg (baseline+progressive JPEG) and libpng (RGB/RGBA/gray).
// Layout: RGB HWC uint8, matching data/loader.py's default_decode (which is
// the cv2 fallback). Resize: center-crop to square then bilinear — the
// runtime loader only resizes when dataset images mismatch the static config
// shape (prep tools write exact-size crops; cv2's INTER_CUBIC stays on that
// path, see data/loader.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // RGB HWC
  int width = 0;
  int height = 0;
};

// ---------------------------------------------------------------- JPEG

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG. When the image turns out to be exactly target x target,
// scanlines are written straight into `direct_out` (no intermediate buffer,
// no copy — the hot path for pre-cropped datasets); otherwise into img->data.
// Sets *used_direct accordingly.
bool decode_jpeg(FILE* f, Image* out, int target, uint8_t* direct_out,
                 bool* used_direct) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
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
  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  const int stride = out->width * 3;

  uint8_t* dst;
  bool direct = direct_out != nullptr && out->width == target &&
                out->height == target;
  if (direct) {
    dst = direct_out;
  } else {
    out->data.resize(size_t(out->width) * out->height * 3);
    dst = out->data.data();
  }
  if (used_direct) *used_direct = direct;

  // Hand libjpeg a window of row pointers so it can return several
  // scanlines per call (rec_outbuf_height is typically 1-4).
  JSAMPROW rows[4];
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned int base = cinfo.output_scanline;
    unsigned int avail = cinfo.output_height - base;
    unsigned int want = avail < 4 ? avail : 4;
    for (unsigned int i = 0; i < want; ++i)
      rows[i] = dst + size_t(base + i) * stride;
    jpeg_read_scanlines(&cinfo, rows, want);
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

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int color_type = png_get_color_type(png, info);
  int bit_depth = png_get_bit_depth(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // Drop alpha to plain RGB.
  if (color_type & PNG_COLOR_MASK_ALPHA ||
      png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->width = int(width);
  out->height = int(height);
  out->data.resize(size_t(width) * height * 3);
  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = out->data.data() + size_t(y) * width * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out, int target = 0,
                 uint8_t* direct_out = nullptr, bool* used_direct = nullptr) {
  if (used_direct) *used_direct = false;
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    ok = decode_jpeg(f, out, target, direct_out, used_direct);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// ------------------------------------------------------- crop + resize

// Center-crop to square, then bilinear-resize to target x target, RGB HWC.
void crop_resize(const Image& img, int target, uint8_t* out) {
  int side = img.width < img.height ? img.width : img.height;
  int x0 = (img.width - side) / 2;
  int y0 = (img.height - side) / 2;

  if (side == target) {  // fast path: pure crop / copy
    for (int y = 0; y < target; ++y) {
      const uint8_t* src =
          img.data.data() + (size_t(y0 + y) * img.width + x0) * 3;
      memcpy(out + size_t(y) * target * 3, src, size_t(target) * 3);
    }
    return;
  }

  const float scale = float(side) / float(target);
  for (int y = 0; y < target; ++y) {
    float sy = (y + 0.5f) * scale - 0.5f + y0;
    int iy = int(floorf(sy));
    float fy = sy - iy;
    int y1 = iy < y0 ? y0 : (iy >= y0 + side ? y0 + side - 1 : iy);
    int y2 = y1 + 1 >= y0 + side ? y0 + side - 1 : y1 + 1;
    for (int x = 0; x < target; ++x) {
      float sx = (x + 0.5f) * scale - 0.5f + x0;
      int ix = int(floorf(sx));
      float fx = sx - ix;
      int x1 = ix < x0 ? x0 : (ix >= x0 + side ? x0 + side - 1 : ix);
      int x2 = x1 + 1 >= x0 + side ? x0 + side - 1 : x1 + 1;
      const uint8_t* p11 = img.data.data() + (size_t(y1) * img.width + x1) * 3;
      const uint8_t* p12 = img.data.data() + (size_t(y1) * img.width + x2) * 3;
      const uint8_t* p21 = img.data.data() + (size_t(y2) * img.width + x1) * 3;
      const uint8_t* p22 = img.data.data() + (size_t(y2) * img.width + x2) * 3;
      uint8_t* dst = out + (size_t(y) * target + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - fy) * ((1 - fx) * p11[c] + fx * p12[c]) +
                  fy * ((1 - fx) * p21[c] + fx * p22[c]);
        dst[c] = uint8_t(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one image, center-crop square, resize to target. out: target*target*3.
int d3f_decode_image(const char* path, int target, uint8_t* out) {
  Image img;
  bool direct = false;
  if (!decode_file(path, &img, target, out, &direct)) return -1;
  if (direct) return 0;  // JPEG decoded straight into `out`
  if (img.width <= 0 || img.height <= 0) return -1;
  crop_resize(img, target, out);
  return 0;
}

int d3f_image_dims(const char* path, int* width, int* height) {
  Image img;  // full decode; dims-only probing is not on a hot path
  if (!decode_file(path, &img)) return -1;
  *width = img.width;
  *height = img.height;
  return 0;
}

// Decode a batch with a thread pool. Returns 0, or -1 with *err_idx = first
// failing image index.
int d3f_load_batch(const char** paths, int n, int target, int n_threads,
                   uint8_t* out, int* err_idx) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::atomic<int> next(0);
  std::atomic<int> failed(-1);
  const size_t frame = size_t(target) * target * 3;

  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (failed.load(std::memory_order_relaxed) >= 0) return;
      if (d3f_decode_image(paths[i], target, out + frame * i) != 0) {
        int expected = -1;
        failed.compare_exchange_strong(expected, i);
        return;
      }
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  int f = failed.load();
  if (f >= 0) {
    if (err_idx) *err_idx = f;
    return -1;
  }
  return 0;
}

}  // extern "C"
