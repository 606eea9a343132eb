// countr_tpu native host core — fused per-sample augmentation ops.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the native
// runtime for the *host* side of the framework: the per-sample train
// augmentation that feeds the device (reference: util/FSC147.py
// photometric/density ops, executed there by numpy/scipy/cv2 with one
// full-image temporary per step). On this framework's single-core
// hosts the numpy version is the train-throughput bottleneck
// (~185 ms/sample in noise+jitter alone at 384x580); these fused
// single-pass C++ kernels run the same math in a few ms.
//
// Contract: images are contiguous float32 HWC (c=3) in [0,1], the
// same layout countr_tpu/data/transforms.py uses. All ops are
// in-place. Every function here has a numpy reference implementation
// in transforms.py; tests/test_native_ops.py asserts equivalence.
//
// C ABI only (loaded via ctypes — no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// RNG: splitmix64-seeded xoshiro256++, Box-Muller normals.
// Distribution-level parity with np.random.Generator.normal — the
// python path stays the deterministic spec; the native path is seeded
// from the same per-sample Generator so runs remain reproducible.
// ---------------------------------------------------------------------------

struct Xoshiro {
  uint64_t s[4];
  explicit Xoshiro(uint64_t seed) {
    // splitmix64 expansion
    uint64_t x = seed;
    for (int i = 0; i < 4; ++i) {
      x += 0x9E3779B97f4A7C15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static inline uint64_t rotl(uint64_t v, int k) {
    return (v << k) | (v >> (64 - k));
  }
  inline uint64_t next() {
    uint64_t result = rotl(s[0] + s[3], 23) + s[0];
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  inline double uniform() {  // (0, 1]
    return double((next() >> 11) + 1) * 0x1.0p-53;
  }
};

inline float clip01(float v) {
  return v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
}

// Marsaglia–Tsang 128-layer ziggurat for standard normals (the same
// algorithm family numpy uses). ~1 table lookup + multiply per sample
// vs Box-Muller's log/sqrt/cos — the difference between losing and
// beating numpy's vectorized generator from scalar code.
struct Ziggurat {
  uint32_t kn[128];
  float wn[128], fn[128];
  Ziggurat() {
    const double m1 = 2147483648.0;
    double dn = 3.442619855899, tn = dn;
    const double vn = 9.91256303526217e-3;
    double q = vn / std::exp(-0.5 * dn * dn);
    kn[0] = uint32_t((dn / q) * m1);
    kn[1] = 0;
    wn[0] = float(q / m1);
    wn[127] = float(dn / m1);
    fn[0] = 1.0f;
    fn[127] = float(std::exp(-0.5 * dn * dn));
    for (int i = 126; i >= 1; --i) {
      dn = std::sqrt(-2.0 * std::log(vn / dn + std::exp(-0.5 * dn * dn)));
      kn[i + 1] = uint32_t((dn / tn) * m1);
      tn = dn;
      fn[i] = float(std::exp(-0.5 * dn * dn));
      wn[i] = float(dn / m1);
    }
  }
};

template <class G>
inline float zig_normal(G& g, const Ziggurat& z) {
  for (;;) {
    int32_t hz = int32_t(uint32_t(g.next()));
    int iz = hz & 127;
    uint32_t ahz = uint32_t(hz < 0 ? -int64_t(hz) : int64_t(hz));
    if (ahz < z.kn[iz]) return float(hz) * z.wn[iz];  // ~99% of draws
    const float r = 3.442619855899f;
    for (;;) {
      float x = float(hz) * z.wn[iz];
      if (iz == 0) {  // tail
        float xt, yt;
        do {
          xt = float(-std::log(g.uniform()) / r);
          yt = float(-std::log(g.uniform()));
        } while (yt + yt < xt * xt);
        return hz > 0 ? r + xt : -(r + xt);
      }
      if (z.fn[iz] + float(g.uniform()) * (z.fn[iz - 1] - z.fn[iz]) <
          std::exp(-0.5f * x * x))
        return x;
      hz = int32_t(uint32_t(g.next()));
      iz = hz & 127;
      ahz = uint32_t(hz < 0 ? -int64_t(hz) : int64_t(hz));
      if (ahz < z.kn[iz]) return float(hz) * z.wn[iz];
    }
  }
}

// Half-sample-symmetric reflection ((d c b a | a b c d | d c b a)) —
// scipy.ndimage's default 'reflect' boundary. Folds repeatedly so any
// radius (even >= the extent) stays in bounds, matching scipy.
inline int reflect(int idx, int n) {
  while (idx < 0 || idx >= n) {
    if (idx < 0) idx = -idx - 1;
    if (idx >= n) idx = 2 * n - idx - 1;
  }
  return idx;
}

}  // namespace

extern "C" {

// img[n] = clip(img + N(0, std)) — fuses numpy's normal() allocation,
// add, clip and astype into one pass
// (transforms.gaussian_noise; reference: util/FSC147.py:134-138).
void ct_noise_clip(float* img, int64_t n, float std, uint64_t seed) {
  static const Ziggurat z;  // tables built once per process
  Xoshiro rng(seed);
  for (int64_t i = 0; i < n; ++i) {
    img[i] = clip01(img[i] + std * zig_normal(rng, z));
  }
}

// img = clip(f*img + (1-f)*other) — brightness (other=0) and contrast
// (other=mean gray) blends (transforms._blend).
void ct_blend_scalar(float* img, int64_t n, float other, float factor) {
  float add = (1.0f - factor) * other;
  for (int64_t i = 0; i < n; ++i) img[i] = clip01(factor * img[i] + add);
}

// Rec.601 luma mean over an HWC image (contrast reference point).
float ct_gray_mean(const float* img, int64_t hw) {
  double acc = 0.0;
  for (int64_t i = 0; i < hw; ++i) {
    const float* p = img + 3 * i;
    acc += 0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2];
  }
  return float(acc / double(hw));
}

// Saturation: per-pixel blend with own gray, fused (no [hw] temporary).
void ct_blend_gray(float* img, int64_t hw, float factor) {
  float omf = 1.0f - factor;
  for (int64_t i = 0; i < hw; ++i) {
    float* p = img + 3 * i;
    float g = omf * (0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2]);
    p[0] = clip01(factor * p[0] + g);
    p[1] = clip01(factor * p[1] + g);
    p[2] = clip01(factor * p[2] + g);
  }
}

// Density-map synthesis as a sparse splat: out = gaussian_filter(
// dot_map(points), sigma, mode='reflect') * scale, computed O(dots*r^2)
// instead of scipy's O(h*w*r) full-image separable filter
// (transforms.density_from_dots; reference: util/FSC147.py:274-279).
// Exactness: the filter is linear, so filtering a sum of deltas equals
// summing per-delta kernel splats; reflect-boundary reads become
// reflected writes. Duplicate/clamped dots collapse to one (the
// reference *assigns* 1.0 into the dot map, it does not accumulate).
// pts_xy: [n,2] float32 (x, y). radius<0 -> scipy default
// int(4.0*sigma + 0.5). Negative int-cast coords wrap like python
// negative indexing (reference quirk, kept).
void ct_density_splat(const float* pts_xy, int64_t npts, int h, int w,
                      float sigma, int radius, float scale, float* out) {
  std::memset(out, 0, sizeof(float) * size_t(h) * size_t(w));
  if (npts <= 0) return;
  int r = radius >= 0 ? radius : int(4.0 * double(sigma) + 0.5);
  // normalized discrete gaussian kernel (scipy _gaussian_kernel1d)
  std::vector<double> k(2 * r + 1);
  double ksum = 0.0;
  for (int i = -r; i <= r; ++i) {
    double v = std::exp(-0.5 * double(i) * double(i) / (double(sigma) * double(sigma)));
    k[i + r] = v;
    ksum += v;
  }
  for (auto& v : k) v /= ksum;

  // dedupe dots exactly like dot_map's assignment semantics
  std::vector<uint8_t> seen(size_t(h) * size_t(w), 0);
  for (int64_t p = 0; p < npts; ++p) {
    int x = int(pts_xy[2 * p]);
    int y = int(pts_xy[2 * p + 1]);
    if (x > w - 1) x = w - 1;
    if (y > h - 1) y = h - 1;
    if (x < 0) x += w;  // python negative-index wrap
    if (y < 0) y += h;
    if (x < 0 || y < 0) continue;  // out of range even after one wrap
    size_t cell = size_t(y) * size_t(w) + size_t(x);
    if (seen[cell]) continue;
    seen[cell] = 1;
    for (int dy = -r; dy <= r; ++dy) {
      int yy = reflect(y + dy, h);
      double ky = k[dy + r] * double(scale);
      for (int dx = -r; dx <= r; ++dx) {
        int xx = reflect(x + dx, w);
        out[size_t(yy) * size_t(w) + size_t(xx)] += float(ky * k[dx + r]);
      }
    }
  }
}

// Weighted variant: out = gaussian_filter(sparse map, mode='reflect')
// * scale where the map's nonzeros are (ys[i], xs[i]) -> vals[i].
// Used to smooth post-crop/mosaic dot maps whose entries can be
// fractional after seam blending (transforms.smooth_density fast path;
// reference: util/FSC147.py:274-279). No dedupe — values accumulate
// like the dense filter would.
void ct_splat_weighted(const int32_t* ys, const int32_t* xs,
                       const float* vals, int64_t n, int h, int w,
                       float sigma, int radius, float scale, float* out) {
  std::memset(out, 0, sizeof(float) * size_t(h) * size_t(w));
  if (n <= 0) return;
  int r = radius >= 0 ? radius : int(4.0 * double(sigma) + 0.5);
  std::vector<double> k(2 * r + 1);
  double ksum = 0.0;
  for (int i = -r; i <= r; ++i) {
    double v = std::exp(-0.5 * double(i) * double(i) / (double(sigma) * double(sigma)));
    k[i + r] = v;
    ksum += v;
  }
  for (auto& v : k) v /= ksum;
  for (int64_t p = 0; p < n; ++p) {
    int y = ys[p], x = xs[p];
    double vw = double(vals[p]) * double(scale);
    for (int dy = -r; dy <= r; ++dy) {
      int yy = reflect(y + dy, h);
      double ky = k[dy + r] * vw;
      for (int dx = -r; dx <= r; ++dx) {
        int xx = reflect(x + dx, w);
        out[size_t(yy) * size_t(w) + size_t(xx)] += float(ky * k[dx + r]);
      }
    }
  }
}

// ABI version for the ctypes loader to sanity-check.
int ct_abi_version() { return 2; }

}  // extern "C"
