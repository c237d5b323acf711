// Native data-path core: aspect-pad area resize + color jitter + batch
// assembly, threaded. The TPU-native counterpart of the reference's
// torch-DataLoader C++ worker pool (SURVEY.md §2c): Python stays the
// orchestration layer; the per-frame pixel work (the reference does it via
// cv2 + PIL round-trips, DM/datasets_mug.py:90-113) runs here.
//
// Exposed as a plain C API consumed through ctypes
// (cvpr23_lfdm_tpu/data/native.py). All images are HWC uint8 or float32.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- resize

// cv2 INTER_AREA-equivalent area-average downscale for one channel-
// interleaved HWC image; bilinear (half-pixel) when upscaling — matching
// OpenCV's documented INTER_AREA behavior.
static void resize_area_f32(const float* src, int sh, int sw, int c,
                            float* dst, int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  if (dh >= sh && dw >= sw) {
    // upscale: OpenCV INTER_AREA zoom-in coefficients (resize.cpp):
    //   s = floor(d * scale); f = (d+1) - (s+1) * inv_scale;
    //   f = f <= 0 ? 0 : f - floor(f)
    const double inv_sy = static_cast<double>(dh) / sh;
    const double inv_sx = static_cast<double>(dw) / sw;
    for (int y = 0; y < dh; ++y) {
      int y0 = static_cast<int>(std::floor(y * sy));
      double wy = (y + 1) - (y0 + 1) * inv_sy;
      wy = wy <= 0 ? 0.0 : wy - std::floor(wy);
      int y1 = std::min(y0 + 1, sh - 1);
      y0 = std::max(y0, 0);
      for (int x = 0; x < dw; ++x) {
        int x0 = static_cast<int>(std::floor(x * sx));
        double wx = (x + 1) - (x0 + 1) * inv_sx;
        wx = wx <= 0 ? 0.0 : wx - std::floor(wx);
        int x1 = std::min(x0 + 1, sw - 1);
        x0 = std::max(x0, 0);
        for (int ch = 0; ch < c; ++ch) {
          double v00 = src[(y0 * sw + x0) * c + ch];
          double v01 = src[(y0 * sw + x1) * c + ch];
          double v10 = src[(y1 * sw + x0) * c + ch];
          double v11 = src[(y1 * sw + x1) * c + ch];
          dst[(y * dw + x) * c + ch] = static_cast<float>(
              (1 - wy) * ((1 - wx) * v00 + wx * v01) +
              wy * ((1 - wx) * v10 + wx * v11));
        }
      }
    }
    return;
  }
  // downscale: exact fractional area average
  for (int y = 0; y < dh; ++y) {
    double y_start = y * sy, y_end = (y + 1) * sy;
    int iy0 = static_cast<int>(std::floor(y_start));
    int iy1 = std::min(static_cast<int>(std::ceil(y_end)), sh);
    for (int x = 0; x < dw; ++x) {
      double x_start = x * sx, x_end = (x + 1) * sx;
      int ix0 = static_cast<int>(std::floor(x_start));
      int ix1 = std::min(static_cast<int>(std::ceil(x_end)), sw);
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0, area = 0.0;
        for (int yy = iy0; yy < iy1; ++yy) {
          double hy = std::min(static_cast<double>(yy + 1), y_end) -
                      std::max(static_cast<double>(yy), y_start);
          for (int xx = ix0; xx < ix1; ++xx) {
            double wx2 = std::min(static_cast<double>(xx + 1), x_end) -
                         std::max(static_cast<double>(xx), x_start);
            acc += hy * wx2 * src[(yy * sw + xx) * c + ch];
            area += hy * wx2;
          }
        }
        dst[(y * dw + x) * c + ch] = static_cast<float>(acc / area);
      }
    }
  }
}

// misc.py:96-110 pad_resize: long side -> `size`, center zero-pad the rest.
void pad_resize_f32(const float* src, int sh, int sw, int c, float* dst,
                    int size) {
  double ratio = static_cast<double>(size) / std::max(sh, sw);
  int nh = static_cast<int>(sh * ratio);
  int nw = static_cast<int>(sw * ratio);
  std::vector<float> tmp(static_cast<size_t>(nh) * nw * c);
  resize_area_f32(src, sh, sw, c, tmp.data(), nh, nw);
  std::memset(dst, 0, sizeof(float) * size * size * c);
  int top = (size - nh) / 2;
  int left = (size - nw) / 2;
  for (int y = 0; y < nh; ++y) {
    std::memcpy(dst + ((top + y) * size + left) * c, tmp.data() + y * nw * c,
                sizeof(float) * nw * c);
  }
}

// ---------------------------------------------------------------- jitter

static inline float gray_of(const float* p) {
  return 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
}

static inline float clamp01(float v) {
  return std::min(std::max(v, 0.f), 1.f);
}

// torchvision-semantics brightness -> contrast -> saturation on float [0,1]
// RGB, in-place, sequential with per-op clamping (the DM datasets' fixed
// order, DM/datasets_mug.py:102-104; one factor draw shared by all frames).
// Per-frame contrast means: `n_frames` frames of `px_per_frame` pixels.
// Hue is handled in Python (rare, cheap at clip scale).
void jitter_bcs_f32(float* clip, int64_t n_frames, int64_t px_per_frame,
                    float fb, float fc, float fs) {
  for (int64_t fi = 0; fi < n_frames; ++fi) {
    float* frame = clip + fi * px_per_frame * 3;
    // brightness
    for (int64_t i = 0; i < px_per_frame * 3; ++i)
      frame[i] = clamp01(frame[i] * fb);
    // contrast: blend with this frame's mean gray
    double mean = 0.0;
    for (int64_t i = 0; i < px_per_frame; ++i) mean += gray_of(frame + i * 3);
    float m = static_cast<float>(mean / px_per_frame);
    for (int64_t i = 0; i < px_per_frame * 3; ++i)
      frame[i] = clamp01(fc * frame[i] + (1 - fc) * m);
    // saturation: blend with per-pixel gray
    for (int64_t i = 0; i < px_per_frame; ++i) {
      float* p = frame + i * 3;
      float gr = gray_of(p);
      p[0] = clamp01(fs * p[0] + (1 - fs) * gr);
      p[1] = clamp01(fs * p[1] + (1 - fs) * gr);
      p[2] = clamp01(fs * p[2] + (1 - fs) * gr);
    }
  }
}

// ---------------------------------------------------------- batch assembly

// Threaded pad-resize of F frames (uint8 HWC in, float32 [0,1] out).
void pad_resize_batch_u8(const uint8_t* src, int f, int sh, int sw, int c,
                         float* dst, int size, int num_threads) {
  auto work = [&](int begin, int end) {
    std::vector<float> fsrc(static_cast<size_t>(sh) * sw * c);
    for (int i = begin; i < end; ++i) {
      const uint8_t* s = src + static_cast<size_t>(i) * sh * sw * c;
      for (size_t j = 0; j < fsrc.size(); ++j) fsrc[j] = s[j] / 255.0f;
      pad_resize_f32(fsrc.data(), sh, sw, c,
                     dst + static_cast<size_t>(i) * size * size * c, size);
    }
  };
  int nt = std::max(1, std::min(num_threads, f));
  std::vector<std::thread> threads;
  int chunk = (f + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int b = t * chunk, e = std::min(f, b + chunk);
    if (b < e) threads.emplace_back(work, b, e);
  }
  for (auto& th : threads) th.join();
}

// Threaded pad-resize of F float32 frames (post-jitter path).
void pad_resize_batch_f32(const float* src, int f, int sh, int sw, int c,
                          float* dst, int size, int num_threads) {
  auto work = [&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      pad_resize_f32(src + static_cast<size_t>(i) * sh * sw * c, sh, sw, c,
                     dst + static_cast<size_t>(i) * size * size * c, size);
    }
  };
  int nt = std::max(1, std::min(num_threads, f));
  std::vector<std::thread> threads;
  int chunk = (f + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int b = t * chunk, e = std::min(f, b + chunk);
    if (b < e) threads.emplace_back(work, b, e);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
