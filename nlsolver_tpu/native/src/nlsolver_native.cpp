// Native host-side components for nlsolver_tpu.
//
// 1. Bit-exact oracles for the reference's RNG functors (nlsolver.h:
//    1176-1382): splitmix64, xoshiro256+, xorshift128+, halton, recurrent —
//    written from the published algorithms (splitmix64: Steele et al.;
//    xoshiro256+/xorshift128+: Blackman & Vigna, public domain) with the
//    reference's seeding quirks reproduced:
//      * splitmix default state 12374563468 (nlsolver.h:1265);
//      * xoshiro seeds s2 from a float in [0,1) cast to uint64 — i.e. zero
//        (nlsolver.h:1295) — so only two words carry entropy;
//      * xorshift seeds x1 = x0 >> 32 (nlsolver.h:1348).
//    The JAX implementations in random/reference_rngs.py are tested
//    against these for exact equality.
//
// 2. Timing utilities mirroring the reference's benchmark harness
//    (utils.h:46-117): a monotonic microsecond clock and a two-heap
//    streaming median.
//
// C ABI only; loaded from Python via ctypes (no pybind11 in this image).

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <queue>
#include <vector>

extern "C" {

// ------------------------------------------------------------- splitmix64

struct NlsSplitmix {
  uint64_t s;
};

static inline uint64_t splitmix_next_u64(uint64_t *s) {
  uint64_t z = (*s += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

static const double kMax64 = 18446744073709551615.0;

void nls_splitmix_seq(uint64_t seed, int n, double *out) {
  uint64_t s = seed;
  for (int i = 0; i < n; i++) {
    out[i] = (double)splitmix_next_u64(&s) / kMax64;
  }
}

// ------------------------------------------------------------ xoshiro256+

void nls_xoshiro_seq(int n, double *out) {
  // reference-equivalent seeding from the default splitmix state
  uint64_t sm = 12374563468ULL;
  uint64_t s[4];
  s[0] = splitmix_next_u64(&sm);
  s[1] = s[0] >> 32;
  s[2] = 0;  // (uint64)(float in [0,1)) in the reference
  s[3] = 0;
  for (int i = 0; i < n; i++) {
    const uint64_t result = s[0] + s[3];
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = (s[3] << 45) | (s[3] >> 19);
    out[i] = (double)result / kMax64;
  }
}

// ----------------------------------------------------------- xorshift128+

void nls_xorshift_seq(int n, double *out) {
  uint64_t sm = 12374563468ULL;
  uint64_t x0 = splitmix_next_u64(&sm);
  uint64_t x1 = x0 >> 32;
  for (int i = 0; i < n; i++) {
    uint64_t t = x0;
    const uint64_t s = x1;
    x0 = s;
    t ^= t << 23;
    t ^= t >> 18;
    t ^= s ^ (s >> 5);
    x1 = t;
    out[i] = (double)(t + s) / kMax64;
  }
}

// ----------------------------------------------------------------- halton

void nls_halton_seq(double base, int n, double *out) {
  double b = base, y = 1, num = 0, d = 1, x = 1;
  for (int i = 0; i < n; i++) {
    x = d - num;
    if (x == 1) {
      num = 1;
      d *= b;
    } else {
      y = d;
      while (x <= y) {
        y /= b;
        num = (b + 1) * y - x;
      }
    }
    out[i] = num / d;
  }
}

// -------------------------------------------------------------- recurrent

void nls_recurrent_seq(double seed, int n, double *out) {
  const double alpha = 0.618034;
  double z = alpha + seed;
  z -= (double)(uint64_t)z;
  for (int i = 0; i < n; i++) {
    z += alpha;
    z -= (double)(uint64_t)z;
    out[i] = z;
  }
}

// ---------------------------------------------------- timing / statistics

double nls_now_us() {
  auto t = std::chrono::steady_clock::now().time_since_epoch();
  return std::chrono::duration<double, std::micro>(t).count();
}

// two-heap streaming median (reference: StreamingMedian, utils.h:77-117)
struct NlsMedian {
  std::priority_queue<double> lower;  // max-heap
  std::priority_queue<double, std::vector<double>, std::greater<double>> upper;
};

void *nls_median_new() { return new NlsMedian(); }

void nls_median_push(void *h, double v) {
  auto *m = static_cast<NlsMedian *>(h);
  if (m->lower.empty() || v <= m->lower.top()) {
    m->lower.push(v);
  } else {
    m->upper.push(v);
  }
  if (m->lower.size() > m->upper.size() + 1) {
    m->upper.push(m->lower.top());
    m->lower.pop();
  } else if (m->upper.size() > m->lower.size()) {
    m->lower.push(m->upper.top());
    m->upper.pop();
  }
}

double nls_median_get(void *h) {
  auto *m = static_cast<NlsMedian *>(h);
  if (m->lower.empty()) return 0.0;
  if (m->lower.size() == m->upper.size()) {
    return (m->lower.top() + m->upper.top()) / 2.0;
  }
  return m->lower.top();
}

void nls_median_free(void *h) { delete static_cast<NlsMedian *>(h); }

}  // extern "C"
