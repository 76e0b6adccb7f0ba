// Native data-loader core: multithreaded JPEG decode + bilinear resize +
// normalize, NHWC float32.
//
// TPU-native equivalent of the reference's host-side input machinery: the
// reference leans on MXNet's native image pipeline (`mx.image.imread` +
// DataLoader worker processes, /root/reference/train_yolov3.py:240-286,
// datasets/*.py `mx.image.imread` call sites).  Here the hot host path —
// bytes -> pixels -> resized normalized float batch — is one C++ call over a
// thread pool, feeding the jitted device step without Python per-image
// overhead or process-pool pickling.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: cc -O3 -shared -fPIC loader.cc -o libvyloader.so -ljpeg -lpthread
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file into an RGB8 buffer. Returns true on success.
bool decode_jpeg(const char* path, std::vector<uint8_t>* pixels, int* w,
                 int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  pixels->resize(size_t(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() + size_t(cinfo.output_scanline) * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize RGB8 (src_h, src_w) -> normalized float32 (out_h, out_w),
// matching cv2.resize(INTER_LINEAR) pixel-center alignment.
void resize_normalize(const uint8_t* src, int src_h, int src_w, float* dst,
                      int out_h, int out_w, const float* mean,
                      const float* stddev) {
  const float sy = float(src_h) / out_h;
  const float sx = float(src_w) / out_w;
  for (int y = 0; y < out_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = int(fy);
    int y1 = y0 + 1 < src_h ? y0 + 1 : src_h - 1;
    float wy = fy - y0;
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = int(fx);
      int x1 = x0 + 1 < src_w ? x0 + 1 : src_w - 1;
      float wx = fx - x0;
      const uint8_t* p00 = src + (size_t(y0) * src_w + x0) * 3;
      const uint8_t* p01 = src + (size_t(y0) * src_w + x1) * 3;
      const uint8_t* p10 = src + (size_t(y1) * src_w + x0) * 3;
      const uint8_t* p11 = src + (size_t(y1) * src_w + x1) * 3;
      float* out = dst + (size_t(y) * out_w + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        out[c] = (v / 255.0f - mean[c]) / stddev[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` JPEG files, resize to (out_h, out_w), normalize with per-channel
// mean/std, write NHWC float32 into `out` (n * out_h * out_w * 3 floats).
// `sizes` (len 2n) receives original (h, w) per image for box un-scaling.
// Failed images are zero-filled and flagged -1 in sizes.
// Returns the number of failures.
int vy_load_batch(const char** paths, int n, int out_h, int out_w,
                  const float* mean, const float* stddev, float* out,
                  int* sizes, int threads) {
  if (threads < 1) threads = 1;
  std::atomic<int> next(0), failures(0);
  auto work = [&]() {
    std::vector<uint8_t> pixels;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int w = 0, h = 0;
      float* dst = out + size_t(i) * out_h * out_w * 3;
      if (decode_jpeg(paths[i], &pixels, &w, &h)) {
        resize_normalize(pixels.data(), h, w, dst, out_h, out_w, mean, stddev);
        sizes[2 * i] = h;
        sizes[2 * i + 1] = w;
      } else {
        memset(dst, 0, size_t(out_h) * out_w * 3 * sizeof(float));
        sizes[2 * i] = -1;
        sizes[2 * i + 1] = -1;
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  int nthreads = threads < n ? threads : n;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(work);
  work();
  for (auto& t : pool) t.join();
  return failures.load();
}

// Decode one JPEG to RGB8; out must hold max_bytes. Returns 0 on failure,
// else writes (h, w) and returns 1. For callers that need raw pixels.
int vy_decode_jpeg(const char* path, uint8_t* out, long max_bytes, int* h,
                   int* w) {
  std::vector<uint8_t> pixels;
  if (!decode_jpeg(path, &pixels, w, h)) return 0;
  if ((long)pixels.size() > max_bytes) return 0;
  memcpy(out, pixels.data(), pixels.size());
  return 1;
}

}  // extern "C"
