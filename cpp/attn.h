// Native CPU attention kernels — C ABI for the ctypes binding.
//
// TPU-native framework's CPU oracle tier, the equivalent of the reference's
// flash_attention_c/csrc/attn.cpp (naive + 1-pass streaming flash attention,
// OpenMP) plus its archived SIMD superset (csrc/archive_)/attn.cpp: GQA head
// grouping, AVX vectorization, bf16<->fp32 conversion). Bound to Python with
// ctypes instead of pybind11.
#pragma once
#include <cstdint>

extern "C" {

struct AttnParams {
  int64_t bs;        // batch size
  int64_t hq;        // query heads
  int64_t hkv;       // kv heads (GQA: hq % hkv == 0)
  int64_t q_len;     // query sequence length
  int64_t kv_len;    // kv sequence length
  int64_t d;         // head dim
  int32_t causal;    // bool
  float sm_scale;    // softmax scale
};

// q: (bs, hq, q_len, d)  k/v: (bs, hkv, kv_len, d)  out: (bs, hq, q_len, d)
// lse: (bs, hq, q_len) or nullptr. All row-major contiguous fp32.
void naive_attn_f32(const float* q, const float* k, const float* v,
                    float* out, float* lse, const AttnParams* p);

void flash_attn_f32(const float* q, const float* k, const float* v,
                    float* out, float* lse, const AttnParams* p);

// bf16 (uint16 payload) variants with fp32 accumulation; cast buffers are
// per-thread fp32 staging (the archive's run_fast_flash_attn_cast_buffer
// pattern, archive attn.cpp:250-351).
void flash_attn_bf16(const uint16_t* q, const uint16_t* k, const uint16_t* v,
                     uint16_t* out, float* lse, const AttnParams* p);

// fp16 (IEEE binary16, uint16 payload) variant, same staging scheme
void flash_attn_fp16(const uint16_t* q, const uint16_t* k, const uint16_t* v,
                     uint16_t* out, float* lse, const AttnParams* p);

// dtype conversion helpers (archive utils.cpp:42-136 equivalents)
void bf16_to_f32(const uint16_t* src, float* dst, int64_t n);
void f32_to_bf16(const float* src, uint16_t* dst, int64_t n);
void fp16_to_f32(const uint16_t* src, float* dst, int64_t n);
void f32_to_fp16(const float* src, uint16_t* dst, int64_t n);

int simd_width();  // lanes of the compiled SIMD path (1 = scalar)
}
