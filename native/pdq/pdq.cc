// PDQ 256-bit perceptual hash — native batch kernel.
//
// Bit-identical C++ mirror of the numpy implementation in
// iprgan_tpu/ops/pdq.py (tested against it in tests/test_pdq.py); the
// algorithm follows Facebook's published TMK+PDQF spec: REC601 luma,
// two-pass Jarosz box-filter downsample to 64x64, 16x64 DCT-II over
// frequencies 1..16 applied two-sided, median threshold -> 256 bits.
//
// Replaces the reference's `pdqhash` pybind11/C++ dependency
// (reference tools/phash_pvalue.py:4,14) with a first-party
// implementation exposed through a C ABI for ctypes.
//
// Build: make -C native   ->  native/build/libpdq.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kDctN = 64;
constexpr int kDctK = 16;

// Centered moving average with truncated borders along rows of an
// h x w row-major buffer (axis = 0 -> down columns, axis = 1 -> along rows).
void box1d(const std::vector<double>& in, std::vector<double>& out, int h,
           int w, int window, int axis) {
  if (window <= 1) {
    out = in;
    return;
  }
  const int lo = window / 2;
  const int hi = window - lo;
  if (axis == 0) {
    std::vector<double> csum(static_cast<size_t>(h + 1) * w, 0.0);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x)
        csum[(y + 1) * static_cast<size_t>(w) + x] =
            csum[y * static_cast<size_t>(w) + x] +
            in[y * static_cast<size_t>(w) + x];
    for (int y = 0; y < h; ++y) {
      const int s = std::max(0, y - lo);
      const int e = std::min(h, y + hi);
      for (int x = 0; x < w; ++x)
        out[y * static_cast<size_t>(w) + x] =
            (csum[e * static_cast<size_t>(w) + x] -
             csum[s * static_cast<size_t>(w) + x]) /
            (e - s);
    }
  } else {
    for (int y = 0; y < h; ++y) {
      const double* row = &in[y * static_cast<size_t>(w)];
      double* orow = &out[y * static_cast<size_t>(w)];
      std::vector<double> csum(w + 1, 0.0);
      for (int x = 0; x < w; ++x) csum[x + 1] = csum[x] + row[x];
      for (int x = 0; x < w; ++x) {
        const int s = std::max(0, x - lo);
        const int e = std::min(w, x + hi);
        orow[x] = (csum[e] - csum[s]) / (e - s);
      }
    }
  }
}

int jarosz_window(int old_dim, int new_dim) {
  int v = (old_dim + 2 * new_dim - 1) / (2 * new_dim);
  return v < 1 ? 1 : v;
}

void hash_one(const uint8_t* img, int h, int w, uint8_t* out_bits) {
  const size_t npix = static_cast<size_t>(h) * w;
  std::vector<double> luma(npix);
  for (size_t i = 0; i < npix; ++i) {
    const uint8_t* p = img + i * 3;
    luma[i] = p[0] * 0.299 + p[1] * 0.587 + p[2] * 0.114;
  }

  const int wy = jarosz_window(h, kDctN);
  const int wx = jarosz_window(w, kDctN);
  std::vector<double> tmp(npix);
  for (int rep = 0; rep < 2; ++rep) {
    box1d(luma, tmp, h, w, wy, /*axis=*/0);
    box1d(tmp, luma, h, w, wx, /*axis=*/1);
  }

  // center-point decimation to 64x64
  double block[kDctN][kDctN];
  for (int i = 0; i < kDctN; ++i) {
    int yi = static_cast<int>((i + 0.5) * h / kDctN);
    if (yi > h - 1) yi = h - 1;
    for (int j = 0; j < kDctN; ++j) {
      int xj = static_cast<int>((j + 0.5) * w / kDctN);
      if (xj > w - 1) xj = w - 1;
      block[i][j] = luma[yi * static_cast<size_t>(w) + xj];
    }
  }

  // 16x64 DCT-II matrix over frequencies 1..16
  static double T[kDctK][kDctN];
  static bool t_init = false;
  if (!t_init) {
    const double scale = std::sqrt(2.0 / kDctN);
    for (int i = 0; i < kDctK; ++i)
      for (int j = 0; j < kDctN; ++j)
        T[i][j] = scale * std::cos(M_PI / (2.0 * kDctN) * (2 * j + 1) *
                                   (i + 1));
    t_init = true;
  }

  // D = T * block * T'
  double tb[kDctK][kDctN];
  for (int i = 0; i < kDctK; ++i)
    for (int j = 0; j < kDctN; ++j) {
      double acc = 0.0;
      for (int k = 0; k < kDctN; ++k) acc += T[i][k] * block[k][j];
      tb[i][j] = acc;
    }
  double d[kDctK * kDctK];
  for (int i = 0; i < kDctK; ++i)
    for (int j = 0; j < kDctK; ++j) {
      double acc = 0.0;
      for (int k = 0; k < kDctN; ++k) acc += tb[i][k] * T[j][k];
      d[i * kDctK + j] = acc;
    }

  // numpy-style median of 256 values: mean of the two middle order stats
  double sorted[kDctK * kDctK];
  std::memcpy(sorted, d, sizeof(d));
  std::nth_element(sorted, sorted + 127, sorted + 256);
  const double m1 = sorted[127];
  const double m2 = *std::min_element(sorted + 128, sorted + 256);
  const double median = 0.5 * (m1 + m2);

  for (int i = 0; i < kDctK * kDctK; ++i)
    out_bits[i] = d[i] > median ? 1 : 0;
}

}  // namespace

extern "C" {

// images: n contiguous HxWx3 uint8 frames; out: n x 256 uint8 {0,1}.
void pdq_hash_batch(const uint8_t* images, int n, int h, int w,
                    uint8_t* out) {
  const size_t frame = static_cast<size_t>(h) * w * 3;
  for (int i = 0; i < n; ++i)
    hash_one(images + frame * i, h, w, out + static_cast<size_t>(i) * 256);
}

}  // extern "C"
