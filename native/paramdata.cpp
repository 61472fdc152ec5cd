// paramdata: native data-generation library for param_tpu.
//
// The reference delegates its hot host-side loops to vendor native code
// (fbgemm, torch RNG); param_tpu's equivalent host-side hot path is sparse
// index generation for the embedding/DLRM benches (billions of Zipf/uniform
// draws per long run), implemented here and exposed to Python via ctypes
// (param_tpu/utils/native.py), with a numpy fallback when the library is
// not built.
//
// Build: make -C native   (produces libparamdata.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <vector>

namespace {

// xoshiro256** — fast, high-quality 64-bit PRNG
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 seeding
    uint64_t z = seed;
    for (int i = 0; i < 4; i++) {
      z += 0x9e3779b97f4a7c15ULL;
      uint64_t x = z;
      x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
      x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
      s[i] = x ^ (x >> 31);
    }
  }
  static inline uint64_t rotl(uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
  }
  inline uint64_t next() {
    uint64_t result = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  inline double uniform() {  // [0, 1)
    return (next() >> 11) * 0x1.0p-53;
  }
  inline uint64_t bounded(uint64_t n) {  // [0, n) — Lemire reduction
    __uint128_t m = (__uint128_t)next() * n;
    return (uint64_t)(m >> 64);
  }
};

// Bounded Zipf sampler: P(k) ∝ 1/(k+1)^alpha for k in [0, n).
// Inverse-CDF with a precomputed cumulative table + binary search.
struct ZipfSampler {
  std::vector<double> cdf;
  explicit ZipfSampler(double alpha, int64_t n) {
    cdf.resize(n);
    double acc = 0.0;
    for (int64_t k = 0; k < n; k++) {
      acc += std::pow((double)(k + 1), -alpha);
      cdf[k] = acc;
    }
    double inv = 1.0 / acc;
    for (int64_t k = 0; k < n; k++) cdf[k] *= inv;
  }
  inline int64_t sample(Rng& rng) const {
    double u = rng.uniform();
    return std::lower_bound(cdf.begin(), cdf.end(), u) - cdf.begin();
  }
};

}  // namespace

extern "C" {

void pd_uniform_indices(uint64_t seed, int64_t n_rows, int64_t count,
                        int32_t* out) {
  Rng rng(seed);
  for (int64_t i = 0; i < count; i++) {
    out[i] = (int32_t)rng.bounded((uint64_t)n_rows);
  }
}

void* pd_zipf_make(double alpha, int64_t n_rows) {
  return new ZipfSampler(alpha, n_rows);
}

void pd_zipf_free(void* h) { delete (ZipfSampler*)h; }

void pd_zipf_sample(void* h, uint64_t seed, int64_t count, int32_t* out) {
  auto* z = (ZipfSampler*)h;
  Rng rng(seed);
  for (int64_t i = 0; i < count; i++) {
    out[i] = (int32_t)z->sample(rng);
  }
}

// Ragged bag lengths: uniform in [1, max_nnz], CSR offsets out (batch+1).
void pd_ragged_offsets(uint64_t seed, int64_t batch, int64_t max_nnz,
                       int64_t* out_offsets) {
  Rng rng(seed);
  out_offsets[0] = 0;
  for (int64_t b = 0; b < batch; b++) {
    int64_t len = 1 + (int64_t)rng.bounded((uint64_t)max_nnz);
    out_offsets[b + 1] = out_offsets[b] + len;
  }
}

// CSR (indices, offsets) -> dense (batch, max_nnz) bag matrix padded with
// pad_value (the zero-pad-row id).  The hot host-side prep for ragged
// embedding bags (reference: fbgemm takes CSR directly; the XLA path pads,
// ops/embedding.py pad_ragged_indices).
void pd_pad_ragged(const int32_t* indices, const int64_t* offsets,
                   int64_t batch, int64_t max_nnz, int32_t pad_value,
                   int32_t* out) {
  for (int64_t b = 0; b < batch; b++) {
    int64_t lo = offsets[b], hi = offsets[b + 1];
    int64_t len = hi - lo;
    if (len > max_nnz) len = max_nnz;
    int32_t* row = out + b * max_nnz;
    for (int64_t j = 0; j < len; j++) row[j] = indices[lo + j];
    for (int64_t j = len; j < max_nnz; j++) row[j] = pad_value;
  }
}

// Dense normal features via Box-Muller (float32 out).
void pd_normal(uint64_t seed, int64_t count, float* out) {
  Rng rng(seed);
  for (int64_t i = 0; i + 1 < count; i += 2) {
    double u1 = rng.uniform(), u2 = rng.uniform();
    if (u1 < 1e-300) u1 = 1e-300;
    double r = std::sqrt(-2.0 * std::log(u1));
    out[i] = (float)(r * std::cos(2.0 * M_PI * u2));
    out[i + 1] = (float)(r * std::sin(2.0 * M_PI * u2));
  }
  if (count & 1) out[count - 1] = 0.0f;
}

}  // extern "C"
