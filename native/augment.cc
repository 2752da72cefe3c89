// Native data-path engine: per-sprite augmentation + normalization.
//
// The reference pays its per-epoch image work inside torchvision
// transforms running in DataLoader worker processes
// (reference: src/data/dataset_improved.py:150-158, 287-312).  This is
// the TPU-host equivalent: a small C++ library that applies
// [hflip -> rotate(+-10deg, bilinear, bg fill) -> color jitter ->
//  random resized crop] to uint8 RGB sprites and emits fp32 [-1,1]
// tensors, threaded across the batch, deterministic from a 64-bit seed
// (splitmix64 per image).  Exposed via ctypes (psg_tpu/data/native.py);
// the pure-Python/PIL implementation remains as a fallback and as the
// semantics reference.
//
// Build: `make -C native` -> native/libpsgaug.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// -- deterministic per-image RNG (splitmix64 -> xorshift128+) -------------

struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    auto mix = [](uint64_t& x) {
      x += 0x9e3779b97f4a7c15ull;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
      return z ^ (z >> 31);
    };
    uint64_t st = seed;
    s0 = mix(st);
    s1 = mix(st);
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  // uniform in [0, 1)
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  double uniform(double lo, double hi) { return lo + (hi - lo) * uniform(); }
};

// -- bilinear sampling ------------------------------------------------------

inline void sample_bilinear(const uint8_t* img, int h, int w, float fy,
                            float fx, const uint8_t bg[3], uint8_t out[3]) {
  if (fx < -1.0f || fy < -1.0f || fx > w || fy > h) {
    out[0] = bg[0];
    out[1] = bg[1];
    out[2] = bg[2];
    return;
  }
  int x0 = (int)std::floor(fx), y0 = (int)std::floor(fy);
  float ax = fx - x0, ay = fy - y0;
  for (int c = 0; c < 3; ++c) {
    float acc = 0.f;
    for (int dy = 0; dy < 2; ++dy) {
      for (int dx = 0; dx < 2; ++dx) {
        int xx = x0 + dx, yy = y0 + dy;
        float wgt = (dx ? ax : 1.f - ax) * (dy ? ay : 1.f - ay);
        float v = (xx >= 0 && xx < w && yy >= 0 && yy < h)
                      ? img[(yy * w + xx) * 3 + c]
                      : bg[c];
        acc += wgt * v;
      }
    }
    out[c] = (uint8_t)std::clamp(acc + 0.5f, 0.f, 255.f);
  }
}

// -- transforms -------------------------------------------------------------

void hflip(std::vector<uint8_t>& buf, int h, int w) {
  for (int y = 0; y < h; ++y) {
    uint8_t* row = buf.data() + (size_t)y * w * 3;
    for (int x = 0; x < w / 2; ++x) {
      for (int c = 0; c < 3; ++c)
        std::swap(row[x * 3 + c], row[(w - 1 - x) * 3 + c]);
    }
  }
}

void rotate(const std::vector<uint8_t>& src, std::vector<uint8_t>& dst, int h,
            int w, float degrees, const uint8_t bg[3]) {
  const float rad = degrees * (float)M_PI / 180.f;
  const float cs = std::cos(rad), sn = std::sin(rad);
  const float cy = (h - 1) * 0.5f, cx = (w - 1) * 0.5f;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      // inverse rotation about the center
      float dx = x - cx, dy = y - cy;
      float sxf = cs * dx + sn * dy + cx;
      float syf = -sn * dx + cs * dy + cy;
      sample_bilinear(src.data(), h, w, syf, sxf, bg,
                      dst.data() + ((size_t)y * w + x) * 3);
    }
  }
}

void color_jitter(std::vector<uint8_t>& buf, int h, int w, Rng& rng) {
  const float b = 1.f + (float)rng.uniform(-0.1, 0.1);   // brightness
  const float c = 1.f + (float)rng.uniform(-0.1, 0.1);   // contrast
  const float s = 1.f + (float)rng.uniform(-0.1, 0.1);   // saturation
  const float hshift = (float)rng.uniform(-0.05, 0.05);  // hue (approx)

  // mean gray for contrast pivot
  double mean = 0.0;
  const size_t n = (size_t)h * w;
  for (size_t i = 0; i < n; ++i) {
    const uint8_t* p = buf.data() + i * 3;
    mean += 0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2];
  }
  mean /= (double)n;

  // approximate hue rotation: rotate RGB about the gray axis
  const float theta = hshift * 2.f * (float)M_PI;
  const float cosh_ = std::cos(theta), sinh_ = std::sin(theta);
  const float one3 = 1.f / 3.f, sq3 = std::sqrt(1.f / 3.f);
  float m[9];
  m[0] = cosh_ + (1 - cosh_) * one3;
  m[1] = one3 * (1 - cosh_) - sq3 * sinh_;
  m[2] = one3 * (1 - cosh_) + sq3 * sinh_;
  m[3] = one3 * (1 - cosh_) + sq3 * sinh_;
  m[4] = cosh_ + one3 * (1 - cosh_);
  m[5] = one3 * (1 - cosh_) - sq3 * sinh_;
  m[6] = one3 * (1 - cosh_) - sq3 * sinh_;
  m[7] = one3 * (1 - cosh_) + sq3 * sinh_;
  m[8] = cosh_ + one3 * (1 - cosh_);

  for (size_t i = 0; i < n; ++i) {
    uint8_t* p = buf.data() + i * 3;
    float r = p[0], g = p[1], bl = p[2];
    // brightness
    r *= b; g *= b; bl *= b;
    // contrast about the (pre-jitter) mean gray
    r = (float)mean + (r - (float)mean) * c;
    g = (float)mean + (g - (float)mean) * c;
    bl = (float)mean + (bl - (float)mean) * c;
    // saturation about per-pixel gray
    float gray = 0.299f * r + 0.587f * g + 0.114f * bl;
    r = gray + (r - gray) * s;
    g = gray + (g - gray) * s;
    bl = gray + (bl - gray) * s;
    // hue rotation
    float r2 = m[0] * r + m[1] * g + m[2] * bl;
    float g2 = m[3] * r + m[4] * g + m[5] * bl;
    float b2 = m[6] * r + m[7] * g + m[8] * bl;
    p[0] = (uint8_t)std::clamp(r2, 0.f, 255.f);
    p[1] = (uint8_t)std::clamp(g2, 0.f, 255.f);
    p[2] = (uint8_t)std::clamp(b2, 0.f, 255.f);
  }
}

void random_resized_crop(const std::vector<uint8_t>& src,
                         std::vector<uint8_t>& dst, int h, int w, Rng& rng,
                         const uint8_t bg[3]) {
  // scale (0.9, 1.0), log-ratio (0.9, 1.1) like torchvision
  int ch = h, cw = w, top = 0, left = 0;
  for (int attempt = 0; attempt < 10; ++attempt) {
    double area = (double)h * w * rng.uniform(0.9, 1.0);
    double aspect = std::exp(rng.uniform(std::log(0.9), std::log(1.1)));
    int tw = (int)std::lround(std::sqrt(area * aspect));
    int th = (int)std::lround(std::sqrt(area / aspect));
    if (tw <= w && th <= h) {
      cw = tw;
      ch = th;
      top = (int)(rng.uniform() * (h - th + 1));
      left = (int)(rng.uniform() * (w - tw + 1));
      break;
    }
  }
  // resize crop back to (h, w)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      // half-pixel mapping into the crop
      float sy = ((y + 0.5f) * ch) / h - 0.5f + top;
      float sx = ((x + 0.5f) * cw) / w - 0.5f + left;
      sample_bilinear(src.data(), h, w, sy, sx, bg,
                      dst.data() + ((size_t)y * w + x) * 3);
    }
  }
}

void process_one(const uint8_t* in, float* out, int h, int w, uint64_t seed,
                 const uint8_t bg[3], bool augment) {
  const size_t npx = (size_t)h * w * 3;
  std::vector<uint8_t> a(in, in + npx);
  if (augment) {
    Rng rng(seed);
    if (rng.uniform() < 0.5) hflip(a, h, w);
    std::vector<uint8_t> b(npx);
    rotate(a, b, h, w, (float)rng.uniform(-10.0, 10.0), bg);
    color_jitter(b, h, w, rng);
    random_resized_crop(b, a, h, w, rng, bg);
  }
  // (v - 127.5) / 127.5 keeps 255 -> exactly 1.0 (matches the Python
  // path's v / 127.5 - 1, where 255/127.5 is exactly 2.0 in fp32)
  for (size_t i = 0; i < npx; ++i) out[i] = (a[i] - 127.5f) / 127.5f;
}

}  // namespace

extern "C" {

// in:  n * h * w * 3 uint8 RGB
// out: n * h * w * 3 fp32 in [-1, 1]
// Deterministic: image i uses seed (seed ^ splitmix(i)).
void psg_augment_batch(const uint8_t* in, int n, int h, int w, float* out,
                       uint64_t seed, const uint8_t* bg, int do_augment,
                       int num_threads) {
  const size_t stride = (size_t)h * w * 3;
  int nt = num_threads > 0 ? num_threads : 1;
  nt = std::min(nt, n > 0 ? n : 1);
  std::vector<std::thread> workers;
  auto work = [&](int t) {
    for (int i = t; i < n; i += nt) {
      process_one(in + i * stride, out + i * stride, h, w,
                  seed + 0x9e3779b97f4a7c15ull * (uint64_t)(i + 1), bg,
                  do_augment != 0);
    }
  };
  for (int t = 1; t < nt; ++t) workers.emplace_back(work, t);
  work(0);
  for (auto& th : workers) th.join();
}

int psg_native_version() { return 1; }

}  // extern "C"
