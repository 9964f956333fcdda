// okt_native: C++ host-side data plane for object_keypoints_tpu.
//
// The reference's native layer is CUDA-adjacent C++ (corner pooling ATen
// extensions) and Cython NMS, plus numba-jitted target splatting
// (perception/datasets/video.py:22-55). On TPU the compute-path equivalents
// live in XLA/Pallas; the piece that stays on the host is the data plane,
// and this host has a single CPU core — so the hot per-frame loops
// (gaussian target splatting, discrete-kernel pasting, fused image
// normalization) are implemented here as a small C library consumed via
// ctypes (object_keypoints_tpu/data/native.py), with pure-numpy fallbacks.
//
// Build: make -C native   (produces libokt_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

// Additive sub-pixel gaussian splat, truncated to a window around the
// int-cast keypoint — semantics of _set_keypoints (video.py:44-55).
// points: n x 2 (x, y); out: h x w row-major, accumulated in place.
void okt_splat_gaussian(float *out, int h, int w, const float *points,
                        int n_points, float length_scale, int window_radius) {
  const float inv_ls2 = 1.0f / (length_scale * length_scale);
  for (int p = 0; p < n_points; ++p) {
    const float px = points[2 * p];
    const float py = points[2 * p + 1];
    const int ix = static_cast<int>(px);  // trunc like numpy astype(int32)
    const int iy = static_cast<int>(py);
    const int x0 = std::max(ix - window_radius, 0);
    const int y0 = std::max(iy - window_radius, 0);
    const int x1 = std::min(ix + window_radius + 1, w);
    const int y1 = std::min(iy + window_radius + 1, h);
    for (int i = y0; i < y1; ++i) {
      const float dy = py - static_cast<float>(i);
      const float dy2 = dy * dy;
      float *row = out + static_cast<long>(i) * w;
      for (int j = x0; j < x1; ++j) {
        const float dx = px - static_cast<float>(j);
        row[j] += std::exp(-(dx * dx + dy2) * inv_ls2);
      }
    }
  }
}

// Rounded-placement paste of a precomputed kernel — semantics of
// _add_kernel (video.py:139-183) including its edge arithmetic.
void okt_add_discrete_kernel(float *target, int h, int w, const float *kernel,
                             int ksize, int kcenter, const float *points,
                             int n_points) {
  for (int p = 0; p < n_points; ++p) {
    // round-half-to-even like python round()
    const double fx = points[2 * p];
    const double fy = points[2 * p + 1];
    const int x = static_cast<int>(std::nearbyint(fx));
    const int y = static_cast<int>(std::nearbyint(fy));

    const int x_start = std::max(x - kcenter, 0);
    const int x_end = std::max(std::min(x + kcenter, w), 0);
    const int y_start = std::max(y - kcenter, 0);
    const int y_end = std::max(std::min(y + kcenter, h), 0);

    int ky0 = 0, ky1 = ksize, kx0 = 0, kx1 = ksize;
    if (y_start == 0) ky0 = std::abs(y - kcenter);
    if (y + kcenter >= h) ky1 = ky0 + ksize - std::max(y + kcenter - h, 0);
    if (x_start == 0) kx0 = std::abs(x - kcenter);
    if (x + kcenter > w) kx1 = kx0 + ksize - std::max(x + kcenter - w, 0);
    if ((ky1 - ky0) < 0 || (kx1 - kx0) < 0) continue;

    const int rows = std::min(y_end - y_start, ky1 - ky0);
    const int cols = std::min(x_end - x_start, kx1 - kx0);
    for (int i = 0; i < rows; ++i) {
      float *trow = target + static_cast<long>(y_start + i) * w + x_start;
      const float *krow = kernel + static_cast<long>(ky0 + i) * ksize + kx0;
      for (int j = 0; j < cols; ++j) trow[j] += krow[j];
    }
  }
}

// Fused uint8 HWC -> float32 HWC normalize: out = (in/255 - mean) / std
// (video.py:215). One pass, no intermediate allocations.
void okt_normalize_image(const uint8_t *in, float *out, long pixels,
                         const float *mean, const float *std3) {
  const float inv255 = 1.0f / 255.0f;
  const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
  const float s0 = 1.0f / std3[0], s1 = 1.0f / std3[1], s2 = 1.0f / std3[2];
  for (long p = 0; p < pixels; ++p) {
    const uint8_t *px = in + 3 * p;
    float *po = out + 3 * p;
    po[0] = (static_cast<float>(px[0]) * inv255 - m0) * s0;
    po[1] = (static_cast<float>(px[1]) * inv255 - m1) * s1;
    po[2] = (static_cast<float>(px[2]) * inv255 - m2) * s2;
  }
}

// Disc-fill for depth / center-offset targets (video.py:225-263): for each
// keypoint, pixels with |pixel_center - keypoint| < radius are overwritten
// with the given per-point values (n_values floats per point).
void okt_fill_discs(float *out, int h, int w, int n_channels,
                    const float *points, const float *values, int n_points,
                    float radius) {
  const float r2 = radius * radius;
  for (int p = 0; p < n_points; ++p) {
    const float px = points[2 * p];
    const float py = points[2 * p + 1];
    const int x0 = std::max(static_cast<int>(std::floor(px - radius - 1.0f)), 0);
    const int y0 = std::max(static_cast<int>(std::floor(py - radius - 1.0f)), 0);
    const int x1 = std::min(static_cast<int>(std::ceil(px + radius + 1.0f)), w);
    const int y1 = std::min(static_cast<int>(std::ceil(py + radius + 1.0f)), h);
    for (int i = y0; i < y1; ++i) {
      const float cy = static_cast<float>(i) + 0.5f;
      for (int j = x0; j < x1; ++j) {
        const float cx = static_cast<float>(j) + 0.5f;
        const float d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy);
        if (d2 < r2) {
          for (int c = 0; c < n_channels; ++c) {
            out[(static_cast<long>(c) * h + i) * w + j] = values[p * n_channels + c];
          }
        }
      }
    }
  }
}

}  // extern "C"
