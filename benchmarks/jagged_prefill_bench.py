#!/usr/bin/env python
"""Jagged (heterogeneous-length) prefill: row-loop kernel vs alternatives.

The serving-admission workload the row-loop kernel exists for: a batch of
prompts whose lengths diverge. Three ways to run it, measured on the same
inputs (valid-FLOP TF/s — FLOPs counted over sum(L_i^2)/2, so padding
waste shows up as LOW throughput, and retrace cost is reported separately):

  padded   — work-list kernel on the right-padded batch: pays
             B * L_max^2 / 2 scheduled work;
  packed   — prompts packed into one row, STATIC segment offsets prune
             the work list (sum L_i^2/2) but every distinct length mix
             compiles a fresh executable;
  jagged   — row-loop kernel, RUNTIME per-request lengths clamp the
             dynamic KV walk (sum ~L_i^2/2): one executable per padded
             bucket serves every mix.

Usage: python benchmarks/jagged_prefill_bench.py [--rounds 4]
"""

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.flash_rowloop import (
    flash_attention_rowloop)
from tiny_flash_attention_tpu.utils.benchmarking import run_benchmark

HQ, HKV, DIM = 8, 2, 128
LENGTHS = [3968, 1024, 512, 384, 2048, 640, 256, 1152]   # heterogeneous mix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    B = len(LENGTHS)
    L_max = max(LENGTHS)
    L_pad = -(-L_max // 128) * 128
    valid_fl = sum(4 * HQ * L * L * DIM * 0.5 for L in LENGTHS)

    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (B, HQ, L_pad, DIM), jnp.bfloat16)
    k = jax.random.normal(kk, (B, HKV, L_pad, DIM), jnp.bfloat16)
    v = jax.random.normal(kv, (B, HKV, L_pad, DIM), jnp.bfloat16)

    # --- padded batch on the work-list kernel
    f_pad = jax.jit(functools.partial(flash_attention, causal=True))
    r = run_benchmark(f_pad, q, k, v, rounds=args.rounds)
    emit("jagged_prefill_padded_tflops", valid_fl, r)

    # --- jagged row-loop (runtime lengths)
    lens = jnp.asarray(LENGTHS, jnp.int32)
    f_jag = jax.jit(lambda q, k, v, ln: flash_attention_rowloop(
        q, k, v, causal=True, seq_lengths=ln)[0])
    r = run_benchmark(f_jag, q, k, v, lens, rounds=args.rounds)
    emit("jagged_prefill_rowloop_tflops", valid_fl, r)

    # --- packed row with static offsets (worklist pruning)
    offs, off = [], 0
    for L in LENGTHS:
        offs.append(off)
        off += -(-L // 128) * 128
    total = off
    qp = jnp.zeros((1, HQ, total, DIM), jnp.bfloat16)
    kp = jnp.zeros((1, HKV, total, DIM), jnp.bfloat16)
    vp = jnp.zeros((1, HKV, total, DIM), jnp.bfloat16)
    seg = np.zeros((1, total), np.int32)
    for i, L in enumerate(LENGTHS):
        seg[0, offs[i]:offs[i] + -(-L // 128) * 128] = i + 1
    seg = jnp.asarray(seg)
    f_packed = jax.jit(functools.partial(
        flash_attention, causal=True, segment_ids=(seg, seg),
        segment_starts=tuple(offs)))
    r = run_benchmark(f_packed, qp, kp, vp, rounds=args.rounds)
    emit("jagged_prefill_packed_tflops", valid_fl, r)

    # --- retrace cost: a NEW length mix (same bucket) — wall-clock of the
    # first call = compile for packed (new static offsets) vs none for
    # jagged (lengths are runtime)
    lens2 = jnp.asarray([L - 128 if L > 256 else L for L in LENGTHS],
                        jnp.int32)
    t0 = time.perf_counter()
    np.asarray(f_jag(q, k, v, lens2)[0, 0, 0, :1])
    t_jag = time.perf_counter() - t0
    offs2 = tuple(o + 0 for o in offs[:-1]) + (offs[-1] - 128,)
    f_packed2 = jax.jit(functools.partial(
        flash_attention, causal=True, segment_ids=(seg, seg),
        segment_starts=offs2))
    t0 = time.perf_counter()
    np.asarray(f_packed2(qp, kp, vp)[0, 0, 0, :1])
    t_packed = time.perf_counter() - t0
    print(json.dumps({
        "metric": "jagged_new_mix_first_call_s",
        "rowloop": round(t_jag, 3),
        "packed_retrace": round(t_packed, 3),
        "unit": "s (includes one relay fence)",
    }))


def emit(name, fl, r):
    print(json.dumps({
        "metric": name,
        "value": round(fl / (r["min_ms"] / 1e3) / 1e12, 2),
        "median": round(fl / (r["median_ms"] / 1e3) / 1e12, 2),
        "unit": "TFLOPs/s(valid)",
    }), flush=True)


if __name__ == "__main__":
    main()
