// Native CPU attention kernels: naive (3-pass) and flash (1-pass streaming
// online softmax), OpenMP-parallel, SIMD row primitives, GQA, bf16 support.
//
// This is the framework's native CPU oracle tier — the role played in the
// reference by flash_attention_c/csrc/attn.cpp:35-169 (naive + flash, OpenMP)
// and its archived SIMD superset csrc/archive_)/{attn.cpp,fast_attn.h}
// (AVX row primitives row_qk_dot/row_score_v/row_out_rescale, GQA head
// grouping, per-thread fp32 cast buffers for bf16 inputs). Re-designed, not
// translated: one templated SIMD vec<> wrapper replaces the X-macro layer,
// and the streaming loop processes whole KV rows with fused rescale.

#include "attn.h"

#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#if defined(__AVX512F__)
#include <immintrin.h>
#define TFA_SIMD 16
#elif defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>
#define TFA_SIMD 8
#else
#define TFA_SIMD 1
#endif

namespace {

// ---------------------------------------------------------------------------
// SIMD row primitives (the fast_attn.h:100-170 equivalents).
// ---------------------------------------------------------------------------

#if TFA_SIMD == 16
using vf = __m512;
inline vf vload(const float* p) { return _mm512_loadu_ps(p); }
inline void vstore(float* p, vf x) { _mm512_storeu_ps(p, x); }
inline vf vset1(float x) { return _mm512_set1_ps(x); }
inline vf vfmadd(vf a, vf b, vf c) { return _mm512_fmadd_ps(a, b, c); }
inline vf vmul(vf a, vf b) { return _mm512_mul_ps(a, b); }
inline float vreduce(vf x) { return _mm512_reduce_add_ps(x); }
#elif TFA_SIMD == 8
using vf = __m256;
inline vf vload(const float* p) { return _mm256_loadu_ps(p); }
inline void vstore(float* p, vf x) { _mm256_storeu_ps(p, x); }
inline vf vset1(float x) { return _mm256_set1_ps(x); }
inline vf vfmadd(vf a, vf b, vf c) { return _mm256_fmadd_ps(a, b, c); }
inline vf vmul(vf a, vf b) { return _mm256_mul_ps(a, b); }
inline float vreduce(vf x) {
  __m128 lo = _mm256_castps256_ps128(x);
  __m128 hi = _mm256_extractf128_ps(x, 1);
  lo = _mm_add_ps(lo, hi);
  lo = _mm_hadd_ps(lo, lo);
  lo = _mm_hadd_ps(lo, lo);
  return _mm_cvtss_f32(lo);
}
#endif

// dot(a, b) over d elements (row_qk_dot analog, fast_attn.h:100-119)
inline float row_dot(const float* a, const float* b, int64_t d) {
  float acc = 0.f;
  int64_t i = 0;
#if TFA_SIMD > 1
  vf vacc = vset1(0.f);
  for (; i + TFA_SIMD <= d; i += TFA_SIMD)
    vacc = vfmadd(vload(a + i), vload(b + i), vacc);
  acc = vreduce(vacc);
#endif
  for (; i < d; ++i) acc += a[i] * b[i];
  return acc;
}

// out = out * scale + w * row   (row_score_v + row_out_rescale fused,
// fast_attn.h:127-170)
inline void row_rescale_accum(float* out, const float* row, float scale,
                              float w, int64_t d) {
  int64_t i = 0;
#if TFA_SIMD > 1
  vf vs = vset1(scale), vw = vset1(w);
  for (; i + TFA_SIMD <= d; i += TFA_SIMD) {
    vf o = vmul(vload(out + i), vs);
    vstore(out + i, vfmadd(vw, vload(row + i), o));
  }
#endif
  for (; i < d; ++i) out[i] = out[i] * scale + w * row[i];
}

inline void row_scale(float* out, float scale, int64_t d) {
  int64_t i = 0;
#if TFA_SIMD > 1
  vf vs = vset1(scale);
  for (; i + TFA_SIMD <= d; i += TFA_SIMD)
    vstore(out + i, vmul(vload(out + i), vs));
#endif
  for (; i < d; ++i) out[i] *= scale;
}

// bf16 <-> fp32 (archive utils.cpp:53-101: shift-left-16 unpack,
// round-to-nearest-even pack)
inline float bf16_load(uint16_t x) {
  uint32_t y = uint32_t(x) << 16;
  float f;
  std::memcpy(&f, &y, 4);
  return f;
}

inline uint16_t bf16_store(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t rounding = 0x7FFF + ((x >> 16) & 1);  // round to nearest even
  return uint16_t((x + rounding) >> 16);
}

// fp16 (IEEE binary16) <-> fp32 (archive utils.cpp:105-136 equivalents;
// bit-exact incl. subnormals/inf/nan, round-to-nearest-even on store)
inline float fp16_load(uint16_t h) {
  const uint32_t sign = uint32_t(h & 0x8000) << 16;
  const uint32_t exp = (h >> 10) & 0x1F;
  const uint32_t mant = h & 0x3FF;
  uint32_t y;
  if (exp == 0) {
    if (mant == 0) {
      y = sign;  // +-0
    } else {     // subnormal: renormalize
      uint32_t e = 127 - 15 + 1;
      uint32_t m = mant;
      while (!(m & 0x400)) {
        m <<= 1;
        --e;
      }
      y = sign | (e << 23) | ((m & 0x3FF) << 13);
    }
  } else if (exp == 0x1F) {
    y = sign | 0x7F800000u | (mant << 13);  // inf / nan
  } else {
    y = sign | ((exp + 127 - 15) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &y, 4);
  return f;
}

inline uint16_t fp16_store(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  const uint16_t sign = uint16_t((x >> 16) & 0x8000);
  const int32_t exp = int32_t((x >> 23) & 0xFF) - 127 + 15;
  uint32_t mant = x & 0x7FFFFF;
  if (((x >> 23) & 0xFF) == 0xFF)  // inf / nan
    return uint16_t(sign | 0x7C00 | (mant ? 0x200 : 0));
  if (exp >= 0x1F) return uint16_t(sign | 0x7C00);  // overflow -> inf
  if (exp <= 0) {
    if (exp < -10) return sign;  // underflow -> +-0
    // subnormal: shift mantissa (with implicit leading 1) into place
    mant |= 0x800000;
    const int shift = 14 - exp;
    const uint32_t half = 1u << (shift - 1);
    uint32_t r = mant >> shift;
    if ((mant & (half * 2 - 1)) > half || ((mant & (half * 2 - 1)) == half && (r & 1)))
      ++r;  // round to nearest even
    return uint16_t(sign | r);
  }
  uint32_t r = (uint32_t(exp) << 10) | (mant >> 13);
  const uint32_t rem = mant & 0x1FFF;
  if (rem > 0x1000 || (rem == 0x1000 && (r & 1))) ++r;  // RNE (may carry->inf)
  return uint16_t(sign | r);
}

// kv row-length for causal decode shapes: query row i attends to
// kv positions [0, i + 1 + (kv_len - q_len)) (ref c/csrc/attn.cpp:51-53).
inline int64_t causal_kv_limit(int64_t i, const AttnParams& p) {
  int64_t lim = p.causal ? i + 1 + (p.kv_len - p.q_len) : p.kv_len;
  if (lim < 0) lim = 0;
  if (lim > p.kv_len) lim = p.kv_len;
  return lim;
}

template <typename LoadQ, typename LoadK, typename LoadV>
void flash_attn_rows(const AttnParams& p, LoadQ load_q, LoadK load_k,
                     LoadV load_v, float* out_f32, float* lse) {
  const int64_t group = p.hq / p.hkv;
#ifdef _OPENMP
#pragma omp parallel for collapse(3) schedule(static)
#endif
  for (int64_t b = 0; b < p.bs; ++b)
    for (int64_t h = 0; h < p.hq; ++h)
      for (int64_t i = 0; i < p.q_len; ++i) {
        const int64_t hk = h / group;  // GQA (archive attn.cpp:140)
        const float* qrow = load_q(b, h, i);
        float* orow = out_f32 + ((b * p.hq + h) * p.q_len + i) * p.d;
        const int64_t kv_lim = causal_kv_limit(i, p);
        float m = -std::numeric_limits<float>::infinity();
        float l = 0.f;
        for (int64_t t = 0; t < p.d; ++t) orow[t] = 0.f;
        // 1-pass streaming online softmax (ref c/attn.cpp:125-160)
        for (int64_t j = 0; j < kv_lim; ++j) {
          const float s = row_dot(qrow, load_k(b, hk, j), p.d) * p.sm_scale;
          if (s > m) {
            const float alpha = (m == -std::numeric_limits<float>::infinity())
                                    ? 0.f
                                    : std::exp(m - s);
            l = l * alpha + 1.f;
            row_rescale_accum(orow, load_v(b, hk, j), alpha, 1.f, p.d);
            m = s;
          } else {
            const float w = std::exp(s - m);
            l += w;
            row_rescale_accum(orow, load_v(b, hk, j), 1.f, w, p.d);
          }
        }
        const float l_safe = (l == 0.f || l != l) ? 1.f : l;
        row_scale(orow, 1.f / l_safe, p.d);  // single epilogue division
        if (lse)
          lse[(b * p.hq + h) * p.q_len + i] =
              (l == 0.f) ? -std::numeric_limits<float>::infinity()
                         : m + std::log(l);
      }
}

}  // namespace

extern "C" {

int simd_width() { return TFA_SIMD; }

void bf16_to_f32(const uint16_t* src, float* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) dst[i] = bf16_load(src[i]);
}

void f32_to_bf16(const float* src, uint16_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) dst[i] = bf16_store(src[i]);
}

void fp16_to_f32(const uint16_t* src, float* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) dst[i] = fp16_load(src[i]);
}

void f32_to_fp16(const float* src, uint16_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) dst[i] = fp16_store(src[i]);
}

void naive_attn_f32(const float* q, const float* k, const float* v,
                    float* out, float* lse, const AttnParams* pp) {
  const AttnParams p = *pp;
  const int64_t group = p.hq / p.hkv;
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<float> score(p.kv_len);  // materialized row of attn scores
#ifdef _OPENMP
#pragma omp for collapse(3) schedule(static)
#endif
    for (int64_t b = 0; b < p.bs; ++b)
      for (int64_t h = 0; h < p.hq; ++h)
        for (int64_t i = 0; i < p.q_len; ++i) {
          const int64_t hk = h / group;
          const float* qrow = q + ((b * p.hq + h) * p.q_len + i) * p.d;
          float* orow = out + ((b * p.hq + h) * p.q_len + i) * p.d;
          const int64_t kv_lim = causal_kv_limit(i, p);
          // 3-pass softmax (ref c/attn.cpp:56-78)
          float m = -std::numeric_limits<float>::infinity();
          for (int64_t j = 0; j < kv_lim; ++j) {
            const float* krow = k + ((b * p.hkv + hk) * p.kv_len + j) * p.d;
            score[j] = row_dot(qrow, krow, p.d) * p.sm_scale;
            if (score[j] > m) m = score[j];
          }
          float l = 0.f;
          for (int64_t j = 0; j < kv_lim; ++j) {
            score[j] = std::exp(score[j] - m);
            l += score[j];
          }
          const float inv = 1.f / ((l == 0.f || l != l) ? 1.f : l);
          for (int64_t t = 0; t < p.d; ++t) orow[t] = 0.f;
          for (int64_t j = 0; j < kv_lim; ++j) {
            const float* vrow = v + ((b * p.hkv + hk) * p.kv_len + j) * p.d;
            row_rescale_accum(orow, vrow, 1.f, score[j] * inv, p.d);
          }
          if (lse)
            lse[(b * p.hq + h) * p.q_len + i] =
                (l == 0.f) ? -std::numeric_limits<float>::infinity()
                           : m + std::log(l);
        }
  }
}

void flash_attn_f32(const float* q, const float* k, const float* v,
                    float* out, float* lse, const AttnParams* pp) {
  const AttnParams p = *pp;
  flash_attn_rows(
      p, [&](int64_t b, int64_t h, int64_t i) {
        return q + ((b * p.hq + h) * p.q_len + i) * p.d;
      },
      [&](int64_t b, int64_t hk, int64_t j) {
        return k + ((b * p.hkv + hk) * p.kv_len + j) * p.d;
      },
      [&](int64_t b, int64_t hk, int64_t j) {
        return v + ((b * p.hkv + hk) * p.kv_len + j) * p.d;
      },
      out, lse);
}

void flash_attn_bf16(const uint16_t* q, const uint16_t* k, const uint16_t* v,
                     uint16_t* out, float* lse, const AttnParams* pp) {
  const AttnParams p = *pp;
  // Whole-tensor fp32 staging (simplification of the archive's per-thread
  // cast buffers, archive attn.cpp:250-351 — correctness-first oracle).
  const int64_t nq = p.bs * p.hq * p.q_len * p.d;
  const int64_t nkv = p.bs * p.hkv * p.kv_len * p.d;
  std::vector<float> qf(nq), kf(nkv), vf_(nkv), of(nq);
  bf16_to_f32(q, qf.data(), nq);
  bf16_to_f32(k, kf.data(), nkv);
  bf16_to_f32(v, vf_.data(), nkv);
  flash_attn_f32(qf.data(), kf.data(), vf_.data(), of.data(), lse, pp);
  f32_to_bf16(of.data(), out, nq);
}

void flash_attn_fp16(const uint16_t* q, const uint16_t* k, const uint16_t* v,
                     uint16_t* out, float* lse, const AttnParams* pp) {
  const AttnParams p = *pp;
  const int64_t nq = p.bs * p.hq * p.q_len * p.d;
  const int64_t nkv = p.bs * p.hkv * p.kv_len * p.d;
  std::vector<float> qf(nq), kf(nkv), vf_(nkv), of(nq);
  fp16_to_f32(q, qf.data(), nq);
  fp16_to_f32(k, kf.data(), nkv);
  fp16_to_f32(v, vf_.data(), nkv);
  flash_attn_f32(qf.data(), kf.data(), vf_.data(), of.data(), lse, pp);
  f32_to_fp16(of.data(), out, nq);
}

}  // extern "C"
