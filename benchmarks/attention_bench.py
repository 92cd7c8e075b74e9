#!/usr/bin/env python
"""Benchmark suite over the BASELINE.json configs (one JSON line each).

The consolidated counterpart of the reference's per-backend drivers
(flash_attention_cutlass/test.py:51-76, flash_attention_cuda/
self_attention.py:29-89, tiny_flash_attn_triton.py:219-244): warmup/epoch
timing vs the naive-XLA baseline, plus decode tokens/s for the paged-cache
configs. Run: python benchmarks/attention_bench.py
"""

import functools
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops import quant as Q
from tiny_flash_attention_tpu.ops.flash_quant import flash_attention_quantized
from tiny_flash_attention_tpu.ops.paged_fused import (
    fused_paged_decode_attention, pack_paged_cache)
from tiny_flash_attention_tpu.utils.benchmarking import (
    run_benchmark, attention_flops)


def emit(metric, value, unit, vs_baseline=None):
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(vs_baseline, 3)
    print(json.dumps(rec))


def naive(q, k, v, causal):
    group = q.shape[1] // k.shape[1]
    k = jnp.repeat(k, group, axis=1)
    v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s / np.sqrt(q.shape[-1])
    if causal:
        mask = jnp.tril(jnp.ones((q.shape[2], k.shape[2]), bool))
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def bench_fwd(name, bs, hq, hkv, s_len, d, dtype, causal):
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (bs, hq, s_len, d), dtype)
    k = jax.random.normal(kk, (bs, hkv, s_len, d), dtype)
    v = jax.random.normal(kv, (bs, hkv, s_len, d), dtype)
    f = jax.jit(functools.partial(flash_attention, causal=causal))
    r = run_benchmark(f, q, k, v, rounds=5)
    rn = run_benchmark(jax.jit(functools.partial(naive, causal=causal)),
                       q, k, v, rounds=5)
    fl = attention_flops(bs, hq, s_len, s_len, d, causal)
    emit(name, fl / (r["min_ms"] / 1e3) / 1e12, "TFLOPs/s",
         rn["min_ms"] / r["min_ms"])


def naive_3stage(q, k, v, causal):
    """The reference's 3-kernel naive baseline (self_attention.cu:22-81
    launches gemm / softmax / gemm as separate kernels with device syncs).
    On TPU, optimization barriers force the same staging: scores and
    probabilities materialize instead of fusing into one kernel."""
    group = q.shape[1] // k.shape[1]
    k = jnp.repeat(k, group, axis=1)
    v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(q.shape[-1])
    if causal:
        mask = jnp.tril(jnp.ones((q.shape[2], k.shape[2]), bool))
        s = jnp.where(mask, s, -1e30)
    s = jax.lax.optimization_barrier(s)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    p = jax.lax.optimization_barrier(p)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def bench_cfg0():
    """Config 0 (fp32 s128 d64 single-head) is ROUTED: below ~512x512 the
    dispatch table sends shapes to the fused-XLA path, which measured
    faster than any Pallas grid there (BASELINE.md config-0 note). The
    meaningful comparisons at this scale are (a) the routed path vs the
    reference-style 3-stage naive and (b) the reference's own batched-tiny
    geometry (BS=1000, SEQLEN=64 — cuda/self_attention.py:29)."""
    for name, bs, s_len, d in (("cfg0_fp32_s128_d64", 1, 128, 64),
                               ("cfg0_batched_bs1000_s64_d64", 1000, 64, 64)):
        kq, kk, kv = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(kq, (bs, 1, s_len, d), jnp.float32)
        k = jax.random.normal(kk, (bs, 1, s_len, d), jnp.float32)
        v = jax.random.normal(kv, (bs, 1, s_len, d), jnp.float32)
        f = jax.jit(functools.partial(flash_attention, causal=False))
        r = run_benchmark(f, q, k, v, rounds=5)
        rn = run_benchmark(jax.jit(functools.partial(naive_3stage,
                                                     causal=False)),
                           q, k, v, rounds=5)
        fl = attention_flops(bs, 1, s_len, s_len, d, False)
        emit(f"{name}_tflops", fl / (r["min_ms"] / 1e3) / 1e12, "TFLOPs/s",
             rn["min_ms"] / r["min_ms"])


def bench_int8_prefill():
    """int8-KV causal prefill at the headline shape: the work-list
    unification's done-criterion is parity (within ~5%) with the bf16
    kernel at half the cache traffic."""
    bs, hq, hkv, S, d = 2, 8, 2, 2048, 128
    kq, kk, kv = jax.random.split(jax.random.key(4), 3)
    q = jax.random.normal(kq, (bs, hq, S, d), jnp.bfloat16)
    k = jax.random.normal(kk, (bs, hkv, S, d), jnp.bfloat16)
    v = jax.random.normal(kv, (bs, hkv, S, d), jnp.bfloat16)
    kq8, vq8 = Q.quantize_kv(k, v, "int8")
    f = jax.jit(functools.partial(flash_attention_quantized, causal=True))
    r = run_benchmark(f, q, kq8, vq8, rounds=5)
    fb = jax.jit(functools.partial(flash_attention, causal=True))
    rb = run_benchmark(fb, q, k, v, rounds=5)
    fl = attention_flops(bs, hq, S, S, d, causal=True)
    emit("int8_kv_causal_prefill_s2048_tflops",
         fl / (r["min_ms"] / 1e3) / 1e12, "TFLOPs/s",
         rb["min_ms"] / r["min_ms"])


def bench_fp8_prefill():
    # config 3: FP8 QK/PV fused dequant, chunked prefill s=32k (chunks of 4k
    # q rows against the full 32k KV — decode-shaped causal offsets)
    bs, hq, hkv, S, d, chunk = 1, 8, 2, 32768, 128, 4096
    kq, kk, kv = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(kq, (bs, hq, chunk, d), jnp.bfloat16)
    k = jax.random.normal(kk, (bs, hkv, S, d), jnp.bfloat16)
    v = jax.random.normal(kv, (bs, hkv, S, d), jnp.bfloat16)
    kq8, vq8 = Q.quantize_kv(k, v, "fp8")
    f = jax.jit(functools.partial(flash_attention_quantized, causal=True))
    r = run_benchmark(f, q, kq8, vq8, rounds=5)
    fb = jax.jit(functools.partial(flash_attention, causal=True))
    rb = run_benchmark(fb, q, k, v, rounds=5)
    fl = attention_flops(bs, hq, chunk, S, d, causal=False) // 1  # ~full
    emit("fp8_kv_chunked_prefill_s32k_tflops", fl / (r["min_ms"] / 1e3) / 1e12,
         "TFLOPs/s", rb["min_ms"] / r["min_ms"])


def bench_paged_decode(fmt):
    # config 2: paged KV decode, seqlen 8k
    batch, hkv, hq, d, page, pps = 8, 2, 8, 128, 128, 64
    num_pages = batch * pps + 7
    kk, kv2 = jax.random.split(jax.random.key(2))
    k_pages = jax.random.normal(kk, (hkv, num_pages, page, d), jnp.bfloat16)
    v_pages = jax.random.normal(kv2, (hkv, num_pages, page, d), jnp.bfloat16)
    rng = np.random.default_rng(0)
    page_indices = jnp.asarray(rng.permutation(num_pages)[:batch * pps]
                               .reshape(batch, pps).astype(np.int32))
    lengths = jnp.full((batch,), 8192, jnp.int32)
    q = jax.random.normal(jax.random.key(3), (batch, hq, d), jnp.bfloat16)
    fused = pack_paged_cache(
        k_pages.astype(jnp.float32) if fmt == "int8" else k_pages,
        v_pages.astype(jnp.float32) if fmt == "int8" else v_pages, fmt)
    f = jax.jit(functools.partial(fused_paged_decode_attention,
                                  page_size=page))
    r = run_benchmark(f, q, fused, lengths, page_indices, rounds=5)
    toks_per_step = batch
    emit(f"paged_decode_{fmt}_s8k_steps_per_s", 1e3 / r["min_ms"], "steps/s")
    bytes_kv = 8192 * batch * hkv * d * 2 * (1 if fmt == "int8" else 2)
    emit(f"paged_decode_{fmt}_s8k_kv_bandwidth",
         bytes_kv / (r["min_ms"] / 1e3) / 1e9, "GB/s")


def bench_window():
    """Sliding-window causal prefill s8192 w1024: banded tri vs worklist."""
    bs, hq, hkv, S, d, w = 1, 8, 2, 8192, 128, 1024
    kq, kk, kv = jax.random.split(jax.random.key(6), 3)
    q = jax.random.normal(kq, (bs, hq, S, d), jnp.bfloat16)
    k = jax.random.normal(kk, (bs, hkv, S, d), jnp.bfloat16)
    v = jax.random.normal(kv, (bs, hkv, S, d), jnp.bfloat16)
    # valid scores: w(w+1)/2 on the ramp + (S-w) full-width rows
    valid = w * (w + 1) // 2 + (S - w) * w
    fl = 4 * bs * hq * d * valid
    f_auto = jax.jit(functools.partial(flash_attention, causal=True,
                                       window=w))
    r_auto = run_benchmark(f_auto, q, k, v, rounds=5)
    from tiny_flash_attention_tpu.ops.configs import FlashConfig
    f_wl = jax.jit(functools.partial(
        flash_attention, causal=True, window=w,
        config=FlashConfig(block_q=2048, block_kv=512, kv_splits=2)))
    r_wl = run_benchmark(f_wl, q, k, v, rounds=5)
    emit("window_w1024_s8192_tri_block_tflops",
         fl / (r_auto["min_ms"] / 1e3) / 1e12, "TFLOPs/s",
         r_wl["min_ms"] / r_auto["min_ms"])
    emit("window_w1024_s8192_worklist_tflops",
         fl / (r_wl["min_ms"] / 1e3) / 1e12, "TFLOPs/s")


ROWS = {
    # config 0: fp32 single-head (reference tiny_flash_attn shape), routed
    # to the fused-XLA path + the reference's batched-tiny cuda geometry
    "cfg0": bench_cfg0,
    # config 1 (headline): bf16 GQA causal s2048 d128
    "cfg1": lambda: bench_fwd("cfg1_bf16_gqa_causal_s2048_d128_tflops",
                              2, 8, 2, 2048, 128, jnp.bfloat16, True),
    "int8_prefill": bench_int8_prefill,
    "s4096": lambda: bench_fwd("bf16_gqa_causal_s4096_d128_tflops",
                               1, 8, 2, 4096, 128, jnp.bfloat16, True),
    # s8192: the one-shot tri working set exceeds VMEM — auto routes to
    # the q-banded sweep (flash_tri.tri_block_fwd), which keeps the rect
    # geometry with K/V whole-sequence resident per band
    "s8192": lambda: bench_fwd("bf16_gqa_causal_s8192_d128_tflops",
                               1, 8, 2, 8192, 128, jnp.bfloat16, True),
    # sliding window at long S (mistral-style prefill): O(S*window) work;
    # TF/s counts VALID (in-window) FLOPs. auto routes to tri_block's
    # edge-masked band sweep; the worklist row isolates the band grid
    "window": bench_window,
    # non-causal ceiling at the headline shape (whole-sequence row fold)
    "noncausal": lambda: bench_fwd("noncausal_bf16_gqa_s2048_d128_tflops",
                                   2, 8, 2, 2048, 128, jnp.bfloat16, False),
    # off-table head dims (ref static_switch.h:39-66 enumerates 32..256):
    # d=96 pads to 128 lanes, d=192 to 256 — TF/s counts VALID (d-true)
    # FLOPs, so the pad cost reads off directly vs the d=128/256 rows
    # (~d_pad/d: 1.33x for 96, 1.33x for 192)
    "d96": lambda: bench_fwd("bf16_gqa_causal_s2048_d96_tflops",
                             2, 8, 2, 2048, 96, jnp.bfloat16, True),
    "d192": lambda: bench_fwd("bf16_gqa_causal_s2048_d192_tflops",
                              2, 8, 2, 2048, 192, jnp.bfloat16, True),
    # config 2: paged decode
    "paged_bf16": lambda: bench_paged_decode("bf16"),
    "paged_int8": lambda: bench_paged_decode("int8"),
    # config 3: fp8 chunked prefill
    "fp8_prefill": bench_fp8_prefill,
}


def main():
    import argparse
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=sorted(ROWS), default=None,
                    help="run a single row (in this process)")
    ap.add_argument("--isolate", action="store_true",
                    help="run every row in its OWN subprocess: row order "
                         "cannot influence measurements (round-2 finding: "
                         "the int8 row read 82-90 TF/s in a fresh process "
                         "but 43-64 after the paged/fp8 benches — "
                         "process/relay aging, not a kernel property)")
    args = ap.parse_args()
    if args.only:
        ROWS[args.only]()
        return
    if args.isolate:
        for name in ROWS:
            try:
                proc = subprocess.run(
                    [sys.executable, "-u", __file__, "--only", name],
                    capture_output=True, text=True, timeout=2400)
            except subprocess.TimeoutExpired as e:
                # a relay compile stall must cost one row, not the suite
                out = e.stdout or ""
                if isinstance(out, bytes):
                    out = out.decode(errors="replace")
                sys.stdout.write(out)
                sys.stdout.flush()
                print(f"row {name} TIMED OUT (2400s)", file=sys.stderr)
                continue
            sys.stdout.write(proc.stdout)
            sys.stdout.flush()
            if proc.returncode != 0:
                print(f"row {name} FAILED:", file=sys.stderr)
                sys.stderr.write(proc.stderr[-1500:])
        return
    for name in ROWS:
        ROWS[name]()


if __name__ == "__main__":
    main()
