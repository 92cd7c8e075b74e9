#!/usr/bin/env python
"""Headline benchmark: bf16 GQA causal flash-attention forward on one chip.

Mirrors the reference's flagship harness shape (flash_attention_cutlass/
test.py:51-76: naive-vs-flash ms/iter at BS=2, HEAD=8, SEQLEN=2048, DIM=64
fp16 causal), scaled to the BASELINE.md config-1 geometry (seqlen 2k, d=128,
GQA 8q/2kv). Prints ONE JSON line; vs_baseline is the speedup over the naive
XLA softmax-attention baseline measured on the same chip (the reference's
baseline column).
"""

import functools
import json

import jax
import jax.numpy as jnp

from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.utils.benchmarking import run_benchmark, attention_flops

BS, HQ, HKV, SEQ, DIM = 2, 8, 2, 2048, 128


def naive_attention(q, k, v):
    group = q.shape[1] // k.shape[1]
    k = jnp.repeat(k, group, axis=1)
    v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / jnp.sqrt(1.0 * DIM)
    mask = jnp.tril(jnp.ones((SEQ, SEQ), bool))
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def main():
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (BS, HQ, SEQ, DIM), jnp.bfloat16)
    k = jax.random.normal(kk, (BS, HKV, SEQ, DIM), jnp.bfloat16)
    v = jax.random.normal(kv, (BS, HKV, SEQ, DIM), jnp.bfloat16)

    flash = jax.jit(functools.partial(flash_attention, causal=True))
    r_flash = run_benchmark(flash, q, k, v, rounds=8)
    r_naive = run_benchmark(jax.jit(naive_attention), q, k, v, rounds=6)

    flops = attention_flops(BS, HQ, SEQ, SEQ, DIM, causal=True)
    # median-of-N with spread: the relay wobbles +-5% run to run, so the
    # median is the quoted number and best/spread are recorded alongside
    # (round-2 verdict item 4 — one source of truth, spread attached)
    tflops = flops / (r_flash["median_ms"] / 1e3) / 1e12
    print(json.dumps({
        "metric": "flash_attn_fwd_bf16_gqa_causal_s2048_d128_tflops_per_chip",
        "value": round(tflops, 2),
        "best": round(flops / (r_flash["min_ms"] / 1e3) / 1e12, 2),
        "spread": round(r_flash["spread"], 3),
        "unit": "TFLOPs/s",
        "vs_baseline": round(r_naive["median_ms"] / r_flash["median_ms"], 3),
    }))


if __name__ == "__main__":
    main()
