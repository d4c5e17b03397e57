// WaveDM-TPU native data loader.
//
// Multithreaded JPEG/PNG decode + random-crop batch assembly for the
// RainDrop training pipeline, exposed as a C ABI consumed through ctypes
// (wavedm_tpu/data/native_loader.py).  Replaces the reference's
// torch DataLoader worker pool (datasets/raindrop.py:41-48, num_workers=32)
// with a dependency-free native pipeline: the host assembles the
// (batch*patch_n, P, P, 6) float32 tensor that feeds the jitted train step.
//
// Build: make -C native/dataloader   (-> libwavedm_data.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
  bool ok = false;
};

// ----------------------------------------------------------------- JPEG

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void JpegErrorExit(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(mgr->setjmp_buffer, 1);
}

bool DecodeJpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JpegErrorExit;
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
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out->ok = true;
  return true;
}

// ------------------------------------------------------------------ PNG

bool DecodePng(FILE* f, Image* out) {
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
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = int(w);
  out->h = int(h);
  out->rgb.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  out->ok = true;
  return true;
}

bool DecodeFile(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = DecodeJpeg(f, out);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = DecodePng(f, out);
  }
  fclose(f);
  return ok;
}

// splittable deterministic RNG per (seed, image index)
uint64_t Mix(uint64_t a, uint64_t b) {
  uint64_t x = a * 0x9E3779B97F4A7C15ULL + b;
  x ^= x >> 30;
  x *= 0xBF58476D1CE4E5B9ULL;
  x ^= x >> 27;
  x *= 0x94D049BB133111EBULL;
  x ^= x >> 31;
  return x;
}

}  // namespace

extern "C" {

// Decode one image to float32 [0,1] RGB. Caller provides a buffer of
// capacity cap_h*cap_w*3; actual size written to *w,*h. Returns 0 on success.
int wdm_decode_image(const char* path, float* out, int cap_h, int cap_w,
                     int* h, int* w) {
  Image img;
  if (!DecodeFile(path, &img)) return 1;
  if (img.h > cap_h || img.w > cap_w) return 2;
  *h = img.h;
  *w = img.w;
  const float inv = 1.0f / 255.0f;
  for (size_t i = 0, n = img.rgb.size(); i < n; ++i) out[i] = img.rgb[i] * inv;
  return 0;
}

// Assemble a training batch: for each of n_images (input_path, gt_path)
// pairs, draw patch_n random patch x patch crops at shared coordinates and
// write [cond|gt] channels-last float32 [0,1] into
// out[(n_images*patch_n), patch, patch, 6].
// Crop coordinates derive deterministically from (seed, image slot).
// Returns number of images decoded successfully.
int wdm_make_crop_batch(const char** input_paths, const char** gt_paths,
                        int n_images, int patch_n, int patch, uint64_t seed,
                        int n_threads, float* out) {
  std::atomic<int> next(0), ok_count(0);
  const float inv = 1.0f / 255.0f;

  auto worker = [&]() {
    for (;;) {
      int idx = next.fetch_add(1);
      if (idx >= n_images) return;
      Image inp, gt;
      if (!DecodeFile(input_paths[idx], &inp) ||
          !DecodeFile(gt_paths[idx], &gt))
        continue;
      if (gt.w != inp.w || gt.h != inp.h) continue;
      std::mt19937_64 rng(Mix(seed, uint64_t(idx)));
      for (int k = 0; k < patch_n; ++k) {
        int max_y = inp.h - patch, max_x = inp.w - patch;
        int y = max_y > 0 ? int(rng() % uint64_t(max_y + 1)) : 0;
        int x = max_x > 0 ? int(rng() % uint64_t(max_x + 1)) : 0;
        float* dst =
            out + (size_t(idx) * patch_n + k) * size_t(patch) * patch * 6;
        for (int r = 0; r < patch; ++r) {
          const uint8_t* in_row = inp.rgb.data() + (size_t(y + r) * inp.w + x) * 3;
          const uint8_t* gt_row = gt.rgb.data() + (size_t(y + r) * gt.w + x) * 3;
          float* drow = dst + size_t(r) * patch * 6;
          for (int c = 0; c < patch; ++c) {
            drow[c * 6 + 0] = in_row[c * 3 + 0] * inv;
            drow[c * 6 + 1] = in_row[c * 3 + 1] * inv;
            drow[c * 6 + 2] = in_row[c * 3 + 2] * inv;
            drow[c * 6 + 3] = gt_row[c * 3 + 0] * inv;
            drow[c * 6 + 4] = gt_row[c * 3 + 1] * inv;
            drow[c * 6 + 5] = gt_row[c * 3 + 2] * inv;
          }
        }
      }
      ok_count.fetch_add(1);
    }
  };

  int nt = n_threads > 0 ? n_threads : int(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > n_images) nt = n_images;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int i = 0; i < nt; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok_count.load();
}

}  // extern "C"
