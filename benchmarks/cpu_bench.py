#!/usr/bin/env python
"""Native CPU oracle benchmark: naive vs flash vs SIMD-bf16, one JSON line
each — the analog of the reference's flash_attention_c/test.py timing print
(naive vs flash seconds at bs=3, head=32, seqlen=128, dim=128 fp32 causal).
Run: python benchmarks/cpu_bench.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import ml_dtypes
import numpy as np

from tiny_flash_attention_tpu import cpu


def bench(fn, *args, iters=5, **kw):
    fn(*args, **kw)  # warm (and build the .so on first use)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args, **kw)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    bs, h, s, d = 3, 32, 128, 128   # the reference's c/test.py:37-42 config
    q = rng.standard_normal((bs, h, s, d), np.float32)
    k = rng.standard_normal((bs, h, s, d), np.float32)
    v = rng.standard_normal((bs, h, s, d), np.float32)

    t_naive = bench(cpu.naive_attn, q, k, v, causal=True)
    t_flash = bench(cpu.flash_attn, q, k, v, causal=True)
    t_bf16 = bench(cpu.flash_attn_bf16, q.astype(ml_dtypes.bfloat16),
                   k.astype(ml_dtypes.bfloat16),
                   v.astype(ml_dtypes.bfloat16), causal=True)

    flops = 4 * bs * h * s * s * d / 2
    print(json.dumps({
        "metric": "cpu_flash_fp32_causal_gflops",
        "value": round(flops / t_flash / 1e9, 2),
        "unit": "GFLOPs/s",
        "vs_baseline": round(t_naive / t_flash, 3),
    }))
    print(json.dumps({
        "metric": "cpu_flash_bf16_simd_width",
        "value": cpu.simd_width(),
        "unit": "lanes",
        "vs_baseline": round(t_flash / t_bf16, 3),
    }))


if __name__ == "__main__":
    main()
