// Native batch image decoder for the host input pipeline.
//
// The reference delegates frame decode to cv2.imread inside DataLoader
// worker processes (reference: dataset.py:139-146, main.py:57-64). Python
// multiprocessing is heavyweight on this single-core TPU host, and the GIL
// limits thread decode throughput from Python. This library decodes a whole
// batch of PNG frames directly into the caller's preallocated uint8 buffer
// with a std::thread pool, emitting RGB (libpng's native order — the cv2
// path needs an extra BGR->RGB pass).
//
// C ABI (ctypes, see data/native.py):
//   snn_decode_batch(paths, n, out, h, w, c, n_threads) -> 0 ok,
//     else 1-based index of the first failing file.
//
// Build: make -C snn_object_detectionddp_tpu/native  (links libpng).

#include <png.h>

#include <atomic>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Decode one PNG into out (h*w*c, RGB8). Returns true on success.
// Any bit depth/color type is normalized to 8-bit RGB; size must match.
bool decode_png(const char* path, unsigned char* out, int exp_h, int exp_w,
                int exp_c) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  // Normalize to 8-bit RGB.
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

  if ((int)height != exp_h || (int)width != exp_w || exp_c != 3 ||
      png_get_rowbytes(png, info) != (size_t)exp_w * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }

  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = out + (size_t)y * width * 3;
  png_read_image(png, rows.data());

  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

}  // namespace

extern "C" {

int snn_decode_batch(const char** paths, int n_paths, unsigned char* out,
                     int h, int w, int c, int n_threads) {
  if (c != 3 || n_paths <= 0) return -1;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n_paths) n_threads = n_paths;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);  // 1-based index of first failure
  const size_t frame_bytes = (size_t)h * w * c;

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n_paths || failed.load() != 0) return;
      if (!decode_png(paths[i], out + (size_t)i * frame_bytes, h, w, c)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        return;
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failed.load();
}

// Probe the (h, w) of one PNG without decoding pixel data.
int snn_png_shape(const char* path, int* h, int* w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *h = (int)png_get_image_height(png, info);
  *w = (int)png_get_image_width(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

}  // extern "C"
