// Standalone no-Python harness for the native CPU kernels.
//
// The equivalent of the reference's standalone binaries (cuda/standalone_src/
// flash_attention_v2_standalone.cu:321-418, cutlass standalone :922-1043):
// host RNG input init, naive-vs-flash correctness check with an all_close
// gate, a wall-clock benchmark loop over epochs, and — like the reference's
// main() that reruns the WHOLE test 1000 times (cuda v2 standalone :410-418)
// — a stress mode that re-seeds the RNG, regenerates inputs, and re-checks
// every epoch (fp32 + bf16 + fp16 paths) to catch drift/races/NaNs in
// long runs. Build & run:
//     make standalone && ./tfa_standalone [bs hq hkv q_len kv_len d epochs
//                                          stress_epochs]

#include "attn.h"

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

namespace {

bool all_close(const std::vector<float>& a, const std::vector<float>& b,
               float atol) {
  // (ref cuda/standalone_src/helper.h:3-11, atol 1e-5 fp32)
  float max_err = 0.f;
  for (size_t i = 0; i < a.size(); ++i)
    max_err = std::max(max_err, std::fabs(a[i] - b[i]));
  std::printf("max abs err: %.3e (atol %.0e)\n", max_err, atol);
  return max_err <= atol;
}

}  // namespace

int main(int argc, char** argv) {
  AttnParams p;
  p.bs = argc > 1 ? atoll(argv[1]) : 2;
  p.hq = argc > 2 ? atoll(argv[2]) : 8;
  p.hkv = argc > 3 ? atoll(argv[3]) : 2;
  p.q_len = argc > 4 ? atoll(argv[4]) : 256;
  p.kv_len = argc > 5 ? atoll(argv[5]) : 256;
  p.d = argc > 6 ? atoll(argv[6]) : 64;
  const int epochs = argc > 7 ? atoi(argv[7]) : 20;
  p.causal = 1;
  p.sm_scale = 1.0f / std::sqrt(float(p.d));

  std::printf(
      "flash_attention_c standalone: bs=%lld hq=%lld hkv=%lld q=%lld "
      "kv=%lld d=%lld causal simd=%d\n",
      (long long)p.bs, (long long)p.hq, (long long)p.hkv, (long long)p.q_len,
      (long long)p.kv_len, (long long)p.d, simd_width());

  const int64_t nq = p.bs * p.hq * p.q_len * p.d;
  const int64_t nkv = p.bs * p.hkv * p.kv_len * p.d;
  std::vector<float> q(nq), k(nkv), v(nkv), out_naive(nq), out_flash(nq);
  std::mt19937 rng(42);  // host RNG init (ref cuda v2 standalone :334-345)
  std::normal_distribution<float> dist(0.f, 1.f);
  for (auto& x : q) x = dist(rng);
  for (auto& x : k) x = dist(rng);
  for (auto& x : v) x = dist(rng);

  naive_attn_f32(q.data(), k.data(), v.data(), out_naive.data(), nullptr, &p);
  flash_attn_f32(q.data(), k.data(), v.data(), out_flash.data(), nullptr, &p);
  if (!all_close(out_naive, out_flash, 1e-5f)) {
    std::printf("FAILED\n");
    return 1;
  }
  std::printf("PASSED correctness (naive vs flash)\n");

  auto bench = [&](const char* name, auto fn) {
    fn();  // warmup
    auto t0 = std::chrono::steady_clock::now();
    for (int e = 0; e < epochs; ++e) fn();
    double ms = std::chrono::duration<double, std::milli>(
                    std::chrono::steady_clock::now() - t0).count() / epochs;
    std::printf("%-12s %8.3f ms/iter\n", name, ms);
  };
  bench("naive", [&] {
    naive_attn_f32(q.data(), k.data(), v.data(), out_naive.data(), nullptr,
                   &p);
  });
  bench("flash", [&] {
    flash_attn_f32(q.data(), k.data(), v.data(), out_flash.data(), nullptr,
                   &p);
  });

  // Stress mode: the reference's 1000-epoch whole-test rerun
  // (cuda v2 standalone :410-418) — fresh RNG + all dtype paths + gates
  // every epoch; any drift, NaN, or race-dependent flake fails loudly.
  const int stress = argc > 8 ? atoi(argv[8]) : 0;
  if (stress > 0) {
    std::vector<uint16_t> qh(nq), kh(nkv), vh(nkv), outh(nq);
    std::vector<float> outh_f(nq);
    auto t0 = std::chrono::steady_clock::now();
    for (int e = 0; e < stress; ++e) {
      std::mt19937 erng(1000 + e);  // per-epoch RNG re-init
      for (auto& x : q) x = dist(erng);
      for (auto& x : k) x = dist(erng);
      for (auto& x : v) x = dist(erng);
      naive_attn_f32(q.data(), k.data(), v.data(), out_naive.data(),
                     nullptr, &p);
      flash_attn_f32(q.data(), k.data(), v.data(), out_flash.data(),
                     nullptr, &p);
      float max_err = 0.f;
      for (int64_t i = 0; i < nq; ++i)
        max_err = std::max(max_err,
                           std::fabs(out_naive[i] - out_flash[i]));
      // bf16 path vs the fp32 oracle (bf16-class gate)
      f32_to_bf16(q.data(), qh.data(), nq);
      f32_to_bf16(k.data(), kh.data(), nkv);
      f32_to_bf16(v.data(), vh.data(), nkv);
      flash_attn_bf16(qh.data(), kh.data(), vh.data(), outh.data(),
                      nullptr, &p);
      bf16_to_f32(outh.data(), outh_f.data(), nq);
      float max_err_b = 0.f;
      for (int64_t i = 0; i < nq; ++i)
        max_err_b = std::max(max_err_b,
                             std::fabs(out_naive[i] - outh_f[i]));
      // fp16 path (tighter mantissa, same gate as the reference's 1e-2)
      f32_to_fp16(q.data(), qh.data(), nq);
      f32_to_fp16(k.data(), kh.data(), nkv);
      f32_to_fp16(v.data(), vh.data(), nkv);
      flash_attn_fp16(qh.data(), kh.data(), vh.data(), outh.data(),
                      nullptr, &p);
      fp16_to_f32(outh.data(), outh_f.data(), nq);
      float max_err_h = 0.f;
      for (int64_t i = 0; i < nq; ++i)
        max_err_h = std::max(max_err_h,
                             std::fabs(out_naive[i] - outh_f[i]));
      bool bad = !(max_err <= 1e-5f) || !(max_err_b <= 2e-2f) ||
                 !(max_err_h <= 1e-2f);  // !( <= ) also catches NaN
      if (bad || e % 100 == 0)
        std::printf("stress epoch %4d: f32 %.3e bf16 %.3e fp16 %.3e\n",
                    e, max_err, max_err_b, max_err_h);
      if (bad) {
        std::printf("STRESS FAILED at epoch %d\n", e);
        return 1;
      }
    }
    double s = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    std::printf("PASSED stress: %d epochs x 3 dtype paths in %.1f s\n",
                stress, s);
  }
  return 0;
}
