// Native data-loader core: multithreaded JPEG decode + resize (area/cubic,
// matching the Python transform's imresize(interp=9)) + normalize, NHWC
// float32.
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

// Defined below with the tap machinery; declared here so the inference path
// can reuse the exact resamplers the train path uses (same anonymous
// namespace = same entity).
void resample_subrect(const uint8_t* src, int src_w, int sx0, int sy0,
                      int sx1, int sy1, uint8_t* out, int out_w, int dx0,
                      int dy0, int dx1, int dy1, int interp, bool flip);

// Resize RGB8 (src_h, src_w) -> normalized float32 (out_h, out_w) with the
// Python inference transform's imresize(interp=9) semantics: INTER_AREA
// when downscaling (either axis), INTER_CUBIC when upscaling — so native
// and Python decode paths produce the same pixels (and the same cached
// predictions) regardless of which toolchain a host has.  Resampling runs
// in uint8 like cv2.resize on uint8 input, then normalizes.
void resize_normalize(const uint8_t* src, int src_h, int src_w, float* dst,
                      int out_h, int out_w, const float* mean,
                      const float* stddev) {
  const int interp = (src_h > out_h || src_w > out_w) ? 3 : 2;
  std::vector<uint8_t> tmp(size_t(out_h) * out_w * 3);
  resample_subrect(src, src_w, 0, 0, src_w, src_h, tmp.data(), out_w, 0, 0,
                   out_w, out_h, interp, false);
  const uint8_t* p = tmp.data();
  const size_t npix = size_t(out_h) * out_w;
  for (size_t i = 0; i < npix; ++i) {
    for (int c = 0; c < 3; ++c) {
      dst[i * 3 + c] = (p[i * 3 + c] / 255.0f - mean[c]) / stddev[c];
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

// ---------------------------------------------------------------------------
// Augmented train path: decode + fused expand/crop/resize/flip, uint8 NHWC.
//
// The geometry (crop rect in image coordinates — may extend beyond the image,
// those parts are expand-fill) and per-image filter/flip choices are sampled
// in Python from the labels (data/transforms._sample_train_geometry); pixels
// never cross into Python until the finished (out_h, out_w) uint8 tile.
// Color/normalization stays OFF the host entirely (ops/color.py applies the
// per-image affine matrix on device).
// ---------------------------------------------------------------------------

namespace {

inline float cubic_w(float x) {  // Keys kernel, a=-0.75 (cv2's INTER_CUBIC)
  x = x < 0 ? -x : x;
  const float a = -0.75f;
  if (x <= 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return ((a * x - 5.0f * a) * x + 8.0f * a) * x - 4.0f * a;
  return 0.0f;
}

inline uint8_t clamp_u8(float v) {
  return v <= 0.0f ? 0 : (v >= 255.0f ? 255 : (uint8_t)(v + 0.5f));
}

// Per-axis sampling plans, precomputed once per image instead of per pixel.
struct AxisTap {          // bilinear: two taps
  int i0, i1;
  float w1;               // weight of i1; i0 gets 1-w1
};

void plan_linear(int n_dst, float scale, int n_src, std::vector<AxisTap>* t) {
  t->resize(n_dst);
  for (int u = 0; u < n_dst; ++u) {
    float f = (u + 0.5f) * scale - 0.5f;
    if (f < 0) f = 0;
    int i0 = (int)f;
    if (i0 > n_src - 1) i0 = n_src - 1;
    int i1 = i0 + 1 < n_src ? i0 + 1 : n_src - 1;
    (*t)[u] = {i0, i1, f - i0};
  }
}

void plan_nearest(int n_dst, float scale, int n_src, std::vector<int>* m) {
  m->resize(n_dst);
  for (int u = 0; u < n_dst; ++u) {
    int i = (int)(u * scale);  // cv2 INTER_NEAREST: floor(u * scale)
    (*m)[u] = i < n_src ? i : n_src - 1;
  }
}

struct CubicTap {
  int i[4];
  float w[4];
};

void plan_cubic(int n_dst, float scale, int n_src, std::vector<CubicTap>* t) {
  t->resize(n_dst);
  for (int u = 0; u < n_dst; ++u) {
    float f = (u + 0.5f) * scale - 0.5f;
    int i0 = (int)(f < 0 ? f - 1 : f);
    float wsum = 0;
    CubicTap& ct = (*t)[u];
    for (int j = 0; j < 4; ++j) {
      int xs = i0 + j - 1;
      ct.i[j] = xs < 0 ? 0 : (xs >= n_src ? n_src - 1 : xs);
      ct.w[j] = cubic_w(f - (i0 + j - 1));
      wsum += ct.w[j];
    }
    for (int j = 0; j < 4; ++j) ct.w[j] /= wsum;
  }
}

struct AreaSpan {          // fractional box: [first..last] with edge weights
  int first, last;
  float wfirst, wlast, inv;
};

void plan_area(int n_dst, float scale, int n_src, std::vector<AreaSpan>* t) {
  t->resize(n_dst);
  for (int u = 0; u < n_dst; ++u) {
    float a = u * scale, b = (u + 1) * scale;
    if (b > n_src) b = n_src;
    int first = (int)a, last = (int)(b - 1e-5f);
    if (first > n_src - 1) first = n_src - 1;
    if (last > n_src - 1) last = n_src - 1;
    if (last < first) last = first;
    AreaSpan& s = (*t)[u];
    s.first = first;
    s.last = last;
    s.wfirst = first == last ? (b - a) : (first + 1 - a);
    s.wlast = first == last ? (b - a) : (b - last);
    s.inv = 1.0f / (b - a);
  }
}

// Resample the src subrect [sx0,sx1)x[sy0,sy1) of an RGB8 image (row stride
// src_w*3) into the dst subrect [dx0,dx1)x[dy0,dy1) of `out` (row stride
// out_w*3), optionally x-mirroring destination writes across out_w.
// interp: 0 nearest, 1 bilinear, 2/4 cubic (lanczos maps to cubic),
// 3 area (fractional box average when downscaling, bilinear otherwise).
void resample_subrect(const uint8_t* src, int src_w, int sx0, int sy0,
                      int sx1, int sy1, uint8_t* out, int out_w, int dx0,
                      int dy0, int dx1, int dy1, int interp, bool flip) {
  const int sw = sx1 - sx0, sh = sy1 - sy0;
  const int dw = dx1 - dx0, dh = dy1 - dy0;
  const float sx_scale = (float)sw / dw, sy_scale = (float)sh / dh;
  if (interp == 3 && (sx_scale <= 1.0f || sy_scale <= 1.0f)) interp = 1;
  if (interp == 4) interp = 2;

  const uint8_t* base = src + (size_t)sy0 * src_w * 3 + (size_t)sx0 * 3;
  const size_t stride = (size_t)src_w * 3;
  auto orow_px = [&](int v, int u) {
    const int xo = flip ? (out_w - 1 - (dx0 + u)) : (dx0 + u);
    return out + ((size_t)(dy0 + v) * out_w + xo) * 3;
  };

  if (interp == 0) {
    std::vector<int> xm, ym;
    plan_nearest(dw, sx_scale, sw, &xm);
    plan_nearest(dh, sy_scale, sh, &ym);
    for (int v = 0; v < dh; ++v) {
      const uint8_t* r = base + (size_t)ym[v] * stride;
      for (int u = 0; u < dw; ++u) {
        const uint8_t* p = r + (size_t)xm[u] * 3;
        uint8_t* op = orow_px(v, u);
        op[0] = p[0]; op[1] = p[1]; op[2] = p[2];
      }
    }
  } else if (interp == 1) {
    std::vector<AxisTap> xt, yt;
    plan_linear(dw, sx_scale, sw, &xt);
    plan_linear(dh, sy_scale, sh, &yt);
    for (int v = 0; v < dh; ++v) {
      const uint8_t* r0 = base + (size_t)yt[v].i0 * stride;
      const uint8_t* r1 = base + (size_t)yt[v].i1 * stride;
      const float wy = yt[v].w1, iwy = 1.0f - wy;
      for (int u = 0; u < dw; ++u) {
        const int x0 = xt[u].i0 * 3, x1 = xt[u].i1 * 3;
        const float wx = xt[u].w1, iwx = 1.0f - wx;
        uint8_t* op = orow_px(v, u);
        for (int c = 0; c < 3; ++c) {
          float t = iwy * (iwx * r0[x0 + c] + wx * r0[x1 + c]) +
                    wy * (iwx * r1[x0 + c] + wx * r1[x1 + c]);
          op[c] = clamp_u8(t);
        }
      }
    }
  } else if (interp == 2) {
    std::vector<CubicTap> xt, yt;
    plan_cubic(dw, sx_scale, sw, &xt);
    plan_cubic(dh, sy_scale, sh, &yt);
    for (int v = 0; v < dh; ++v) {
      const uint8_t* rows[4];
      for (int j = 0; j < 4; ++j)
        rows[j] = base + (size_t)yt[v].i[j] * stride;
      for (int u = 0; u < dw; ++u) {
        float acc[3] = {0, 0, 0};
        for (int j = 0; j < 4; ++j) {
          const float wy = yt[v].w[j];
          const uint8_t* r = rows[j];
          for (int i2 = 0; i2 < 4; ++i2) {
            const float w = wy * xt[u].w[i2];
            const int x = xt[u].i[i2] * 3;
            acc[0] += w * r[x];
            acc[1] += w * r[x + 1];
            acc[2] += w * r[x + 2];
          }
        }
        uint8_t* op = orow_px(v, u);
        for (int c = 0; c < 3; ++c) op[c] = clamp_u8(acc[c]);
      }
    }
  } else {  // area, exact fractional box (cv2 INTER_AREA downscale)
    std::vector<AreaSpan> xs, ys;
    plan_area(dw, sx_scale, sw, &xs);
    plan_area(dh, sy_scale, sh, &ys);
    for (int v = 0; v < dh; ++v) {
      const AreaSpan& sy = ys[v];
      for (int u = 0; u < dw; ++u) {
        const AreaSpan& sx = xs[u];
        float acc[3] = {0, 0, 0};
        for (int yy = sy.first; yy <= sy.last; ++yy) {
          const float wy =
              yy == sy.first ? sy.wfirst : (yy == sy.last ? sy.wlast : 1.0f);
          const uint8_t* r = base + (size_t)yy * stride;
          for (int xx = sx.first; xx <= sx.last; ++xx) {
            const float w =
                wy * (xx == sx.first ? sx.wfirst
                                     : (xx == sx.last ? sx.wlast : 1.0f));
            const int x = xx * 3;
            acc[0] += w * r[x];
            acc[1] += w * r[x + 1];
            acc[2] += w * r[x + 2];
          }
        }
        uint8_t* op = orow_px(v, u);
        const float norm = sx.inv * sy.inv;
        for (int c = 0; c < 3; ++c) op[c] = clamp_u8(acc[c] * norm);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode n JPEGs and produce augmented uint8 training tiles.
// rects: n x (x0, y0, w, h) crop windows in image coordinates (parts outside
// the image become `fill`).  flips/interps: per-image.  ok[i]=0 marks decode
// failures (tile left as fill).  Returns the number of failures.
int vy_load_train_batch(const char** paths, int n, const int* rects,
                        const uint8_t* flips, const uint8_t* interps,
                        int out_h, int out_w, const uint8_t* fill,
                        uint8_t* out, int* ok, int threads) {
  if (threads < 1) threads = 1;
  std::atomic<int> next(0), failures(0);
  auto work = [&]() {
    std::vector<uint8_t> pixels;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* tile = out + (size_t)i * out_h * out_w * 3;
      for (size_t px = 0; px < (size_t)out_h * out_w; ++px) {
        tile[px * 3] = fill[0];
        tile[px * 3 + 1] = fill[1];
        tile[px * 3 + 2] = fill[2];
      }
      int w = 0, h = 0;
      if (!decode_jpeg(paths[i], &pixels, &w, &h)) {
        ok[i] = 0;
        failures.fetch_add(1);
        continue;
      }
      ok[i] = 1;
      const int x0 = rects[4 * i], y0 = rects[4 * i + 1];
      const int cw = rects[4 * i + 2], ch = rects[4 * i + 3];
      if (cw <= 0 || ch <= 0) continue;
      int sx0 = x0 > 0 ? x0 : 0, sy0 = y0 > 0 ? y0 : 0;
      int sx1 = x0 + cw < w ? x0 + cw : w;
      int sy1 = y0 + ch < h ? y0 + ch : h;
      if (sx1 <= sx0 || sy1 <= sy0) continue;
      const float scale_x = (float)out_w / cw, scale_y = (float)out_h / ch;
      auto rnd = [](float v) { return (int)(v + (v >= 0 ? 0.5f : -0.5f)); };
      int dx0 = rnd((sx0 - x0) * scale_x), dy0 = rnd((sy0 - y0) * scale_y);
      int dx1 = rnd((sx1 - x0) * scale_x), dy1 = rnd((sy1 - y0) * scale_y);
      dx1 = dx1 > out_w ? out_w : dx1;
      dy1 = dy1 > out_h ? out_h : dy1;
      if (dx1 <= dx0 || dy1 <= dy0) continue;
      resample_subrect(pixels.data(), w, sx0, sy0, sx1, sy1, tile, out_w, dx0,
                       dy0, dx1, dy1, interps[i], flips[i] != 0);
    }
  };
  std::vector<std::thread> pool;
  int nthreads = threads < n ? threads : n;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(work);
  work();
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // extern "C"
