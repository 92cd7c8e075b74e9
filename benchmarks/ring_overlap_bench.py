#!/usr/bin/env python
"""Single-chip proxy measurement of ring-attention step economics.

Multi-chip ICI is not available here (one real chip via the relay), so the
overlap question — does the next block's rotation hide under the current
block's attention? — is answered by measuring its two sides separately:

  * t_attn: one ring step's LOCAL attention (the compute window the
    transfer must hide under), at the per-chip shard shape of an
    n_ring-way sequence split;
  * t_merge: the cross-block LSE combine (ring.py _merge) of two partial
    (out, lse) pairs — the per-step overhead the ring adds on top of
    attention, which can NOT overlap (it consumes the step's output);
  * bytes_kv: the K/V bytes each step rotates. With v5e ICI at ~45 GB/s
    per link direction, t_ici ~= bytes_kv / 45e9; the printed
    overlap_margin = t_attn / t_ici says how many times over the compute
    window covers the transfer (> 1 means full overlap is possible, and
    the start-before-compute issue order — asserted against compiled HLO
    in tests/test_ring_overlap.py — lets XLA realize it).

Usage: python benchmarks/ring_overlap_bench.py [--seq 8192] [--ring 4]
"""

import argparse
import functools
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.parallel.ring import _merge
from tiny_flash_attention_tpu.utils.benchmarking import (
    run_benchmark, attention_flops)

BS, HQ, HKV, DIM = 1, 8, 2, 128
ICI_GBPS = 45.0   # v5e per-link unidirectional


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=8192,
                    help="GLOBAL sequence length")
    ap.add_argument("--ring", type=int, default=4, help="ring size n")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    s_local = args.seq // args.ring

    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (BS, HQ, s_local, DIM), jnp.bfloat16)
    k = jax.random.normal(kk, (BS, HKV, s_local, DIM), jnp.bfloat16)
    v = jax.random.normal(kv, (BS, HKV, s_local, DIM), jnp.bfloat16)

    # one FULL (non-diagonal) ring step: local q vs one rotated K/V block
    step = jax.jit(functools.partial(flash_attention, causal=False,
                                     return_lse=True))
    o, lse = step(q, k, v)
    r = run_benchmark(lambda q: step(q, k, v)[0], q, rounds=args.rounds)
    t_attn = r["min_ms"] / 1e3
    fl = attention_flops(BS, HQ, s_local, s_local, DIM, causal=False)

    # the per-step merge of two normalized partials
    merge = jax.jit(lambda o, lse: _merge(
        o.astype(jnp.float32), lse, o, lse)[0].astype(o.dtype))
    rm = run_benchmark(merge, o, lse, rounds=args.rounds)
    t_merge = rm["min_ms"] / 1e3

    bytes_kv = k.size * k.dtype.itemsize * 2
    t_ici = bytes_kv / (ICI_GBPS * 1e9)
    print(json.dumps({
        "metric": f"ring_step_s{args.seq}_n{args.ring}",
        "attn_ms": round(t_attn * 1e3, 4),
        "attn_tflops": round(fl / t_attn / 1e12, 1),
        "merge_ms": round(t_merge * 1e3, 4),
        "merge_frac_of_step": round(t_merge / t_attn, 3),
        "kv_bytes_per_step": bytes_kv,
        "ici_transfer_ms_est": round(t_ici * 1e3, 4),
        "overlap_margin": round(t_attn / t_ici, 2),
        "unit": "see keys",
    }))


if __name__ == "__main__":
    main()
