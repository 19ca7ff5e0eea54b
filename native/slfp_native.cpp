// Native host-side runtime for the TPU SLFP framework.
//
// The TPU does the math; this library covers the host data path where Python
// is the bottleneck:
//   - SLFP<3,4> codec (bit-exact with kernels/quantize.py): checkpoint
//     packing to real 8-bit storage and host-side weight preparation.
//   - CIFAR augmentation pipeline (reflect-pad4 + random crop + hflip +
//     normalize, matching utils/preprocessing.py:4-16 semantics) with a
//     thread pool, feeding batches to the device without a per-image Python
//     loop.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline uint32_t bits_of(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  return u;
}
inline float float_of(uint32_t u) {
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

// Tables mirroring kernels/quantize.py
struct Tables {
  uint32_t p[16];     // mantissa bits of float32(2^(ml/16))
  uint32_t ml_magic;  // c(j) bits
  uint32_t b_lo, b_mid, b_clamp;  // bit patterns of 0.0625, 0.125, 15.32165
  float dec[256];     // full uint8 decode LUT
  Tables() {
    for (int k = 0; k < 16; ++k)
      p[k] = bits_of(std::pow(2.0f, (float)k / 16.0f)) & 0x007fffffu;
    ml_magic = 0;
    for (int j = 0; j < 16; ++j) {
      int ml = (int)std::lround(16.0 * std::log2(1.0 + j / 16.0));
      ml_magic |= (uint32_t)(ml - j) << j;
    }
    b_lo = bits_of(0.0625f);
    b_mid = bits_of(0.125f);
    b_clamp = bits_of(15.32165f);
    for (int c = 0; c < 256; ++c) {
      int code7 = c & 0x7f;
      float v = 0.0f;
      if (code7 != 0) {
        int ml = code7 & 15, e = (code7 >> 4) - 4;
        v = float_of(((uint32_t)(e + 127) << 23) | p[ml]);
      }
      dec[c] = (c & 0x80) ? -v : v;
    }
  }
};
const Tables T;

inline uint8_t pack_one(float x) {
  uint32_t b = bits_of(x);
  uint32_t sign = (b >> 24) & 0x80u;
  uint32_t ab = b & 0x7fffffffu;
  if (ab < T.b_lo) return (uint8_t)sign;          // pseudo-zero
  if (ab < T.b_mid) return (uint8_t)(sign | 16);  // floor -> 0.125
  if (ab > T.b_clamp) return (uint8_t)(sign | 127);
  uint32_t lsb = (ab >> 19) & 1u;
  uint32_t r = (ab + 0x3ffffu + lsb) & ~0x7ffffu;
  uint32_t j = (r >> 19) & 15u;
  uint32_t ml = j + ((T.ml_magic >> j) & 1u);
  int e = (int)(r >> 23) - 127;
  int code7 = (e + 4) * 16 + (int)ml;
  code7 = std::min(std::max(code7, 0), 127);
  return (uint8_t)(sign | (uint32_t)code7);
}

inline float quantize_act_one(float x) {
  // Fake-quant differs from decode(pack(x)) at the boundaries: the reference
  // emits sign*1e-10 below 0.0625 and the *literal* 15.32165 at the clamp
  // (sfp_quant.py:92-95), not the nearest code point.
  uint32_t b = bits_of(x);
  uint32_t ab = b & 0x7fffffffu;
  float s = (b >> 31) ? -1.0f : 1.0f;
  if (ab == 0) return 0.0f;
  if (ab < T.b_lo) return s * 1e-10f;
  if (ab > T.b_clamp) return s * 15.32165f;
  return T.dec[pack_one(x)];
}

void parallel_for(int64_t n, int64_t grain,
                  const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t chunks = std::min<int64_t>(hw, std::max<int64_t>(1, n / grain));
  if (chunks <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t per = (n + chunks - 1) / chunks;
  for (int64_t c = 0; c < chunks; ++c) {
    int64_t lo = c * per, hi = std::min(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

// xorshift64* per-item RNG (deterministic given seed+index)
inline uint64_t mix(uint64_t s) {
  s ^= s >> 12;
  s ^= s << 25;
  s ^= s >> 27;
  return s * 0x2545F4914F6CDD1DULL;
}

}  // namespace

extern "C" {

// SLFP<3,4> codec ----------------------------------------------------------

void slfp34_pack(const float* in, uint8_t* out, int64_t n) {
  parallel_for(n, 1 << 16, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = pack_one(in[i]);
  });
}

void slfp34_unpack(const uint8_t* in, float* out, int64_t n) {
  parallel_for(n, 1 << 16, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = T.dec[in[i]];
  });
}

void slfp34_quantize_act(const float* in, float* out, int64_t n) {
  parallel_for(n, 1 << 16, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = quantize_act_one(in[i]);
  });
}

float absmax(const float* in, int64_t n) {
  std::atomic<uint32_t> best{0};
  parallel_for(n, 1 << 18, [&](int64_t lo, int64_t hi) {
    float m = 0.0f;
    for (int64_t i = lo; i < hi; ++i) m = std::max(m, std::fabs(in[i]));
    uint32_t mb = bits_of(m), cur = best.load();
    while (float_of(cur) < m && !best.compare_exchange_weak(cur, mb)) {
    }
  });
  return float_of(best.load());
}

// CIFAR batch augmentation --------------------------------------------------
// images: n x 32 x 32 x 3 uint8; out: n x 32 x 32 x 3 float32 normalized.
// train != 0: reflect-pad 4 + random 32x32 crop + random hflip.

void cifar_augment(const uint8_t* images, float* out, int64_t n,
                   const float* mean, const float* stdv, int train,
                   uint64_t seed) {
  const int H = 32, W = 32, C = 3, P = 4;
  float inv_std[3], mu[3];
  for (int c = 0; c < C; ++c) {
    inv_std[c] = 1.0f / (255.0f * stdv[c]);
    mu[c] = mean[c] * 255.0f;
  }
  parallel_for(n, 4, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* src = images + i * H * W * C;
      float* dst = out + i * H * W * C;
      int oy = P, ox = P;  // identity crop for eval
      bool flip = false;
      if (train) {
        uint64_t r = mix(seed + 0x9E3779B97F4A7C15ULL * (uint64_t)(i + 1));
        oy = (int)(r % (2 * P + 1));
        ox = (int)((r >> 16) % (2 * P + 1));
        flip = ((r >> 32) & 1) != 0;
      }
      for (int y = 0; y < H; ++y) {
        // reflect-pad source row index for offset oy
        int sy = y + oy - P;
        if (sy < 0) sy = -sy;
        if (sy >= H) sy = 2 * H - 2 - sy;
        for (int x = 0; x < W; ++x) {
          int xx = flip ? (W - 1 - x) : x;
          int sx = xx + ox - P;
          if (sx < 0) sx = -sx;
          if (sx >= W) sx = 2 * W - 2 - sx;
          const uint8_t* px = src + (sy * W + sx) * C;
          float* q = dst + (y * W + x) * C;
          for (int c = 0; c < C; ++c)
            q[c] = ((float)px[c] - mu[c]) * inv_std[c];
        }
      }
    }
  });
}

}  // extern "C"
