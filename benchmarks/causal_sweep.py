#!/usr/bin/env python
"""Sweep harness for the causal-forward roofline push (round 2).

Measures the headline config (bf16 GQA causal s2048 d128) across tile
geometries and kv_splits on the real chip, plus the non-causal ceiling for
each geometry, so the causal efficiency factors (tile-quantization waste x
mask cost) can be read off directly:

    causal_tflops ~= noncausal_tflops * (valid/scheduled) * mask_penalty

Usage: python benchmarks/causal_sweep.py [--seq 2048] [--quick]
"""

import argparse
import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.ops.flash import flash_attention, _build_worklist
from tiny_flash_attention_tpu.utils.benchmarking import (
    run_benchmark, attention_flops)

BS, HQ, HKV, DIM = 2, 8, 2, 128


def scheduled_ratio(seq, block_q_folded, block_kv, group):
    bq = max(128, block_q_folded // group)
    n_q, n_kv = -(-seq // bq), -(-seq // block_kv)
    qis, kvis, flags = _build_worklist(
        n_q, n_kv, bq, block_kv, seq, seq, causal=True)
    valid = seq * (seq + 1) / 2
    return valid / (len(qis) * bq * block_kv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--noncausal", action="store_true",
                    help="also measure the non-causal ceiling per geometry")
    args = ap.parse_args()
    seq = args.seq

    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (BS, HQ, seq, DIM), jnp.bfloat16)
    k = jax.random.normal(kk, (BS, HKV, seq, DIM), jnp.bfloat16)
    v = jax.random.normal(kv, (BS, HKV, seq, DIM), jnp.bfloat16)

    variants = [
        (2048, 512, 1),
        (2048, 512, 2),   # round-1 dispatch entry (baseline)
        (2048, 256, 1),
        (4096, 512, 1),
        (4096, 512, 2),
        (8192, 512, 2),
        (4096, 1024, 2),
    ]

    fl_c = attention_flops(BS, HQ, seq, seq, DIM, causal=True)
    fl_n = attention_flops(BS, HQ, seq, seq, DIM, causal=False)
    print(f"{'bq':>5} {'bkv':>5} {'spl':>3} {'sched':>6} "
          f"{'causal TF/s':>12} {'noncausal':>10}")
    for bq, bkv, spl in variants:
        cfg = FlashConfig(block_q=bq, block_kv=bkv, kv_splits=spl)
        ratio = scheduled_ratio(seq, bq, bkv, HQ // HKV)
        fn = jax.jit(functools.partial(
            flash_attention, causal=True, config=cfg))
        try:
            r = run_benchmark(fn, q, k, v, rounds=args.rounds)
            tf_c = fl_c / (r["min_ms"] / 1e3) / 1e12
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"{bq:>5} {bkv:>5} {spl:>3}  FAILED: {e}")
            continue
        tf_n = float("nan")
        if args.noncausal:
            fn2 = jax.jit(functools.partial(
                flash_attention, causal=False, config=cfg))
            r2 = run_benchmark(fn2, q, k, v, rounds=args.rounds)
            tf_n = fl_n / (r2["min_ms"] / 1e3) / 1e12
        print(f"{bq:>5} {bkv:>5} {spl:>3} {ratio:>6.3f} "
              f"{tf_c:>12.1f} {tf_n:>10.1f}", flush=True)


if __name__ == "__main__":
    main()
