#!/usr/bin/env python
"""On-chip sweep for the triangle-decomposition kernel (round 3).

Measures ops/flash_tri.py at the headline config (bf16 GQA causal s2048
d128) across column-chunk widths, against the work-list kernel's shipped
config, plus s4096 and the int8-KV variant. Prints TF/s computed over the
VALID causal FLOPs (the same accounting as every other benchmark here).

Usage: python benchmarks/tri_sweep.py [--seq 2048] [--rounds 4]
"""

import argparse
import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.quant import quantize_kv
from tiny_flash_attention_tpu.utils.benchmarking import (
    run_benchmark, attention_flops)

BS, HQ, HKV, DIM = 2, 8, 2, 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--subs", type=int, nargs="*", default=[128, 256, 512])
    ap.add_argument("--leaves", type=int, nargs="*", default=None,
                    help="paired with --subs: leaf size per variant "
                         "(0 = same as sub)")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--kernel", choices=["tri", "tri_block"],
                    default="tri")
    ap.add_argument("--window", type=int, default=None,
                    help="sliding window (tri_block only)")
    args = ap.parse_args()
    leaves = args.leaves or [0] * len(args.subs)
    assert len(leaves) == len(args.subs)
    seq = args.seq

    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (BS, HQ, seq, DIM), jnp.bfloat16)
    k = jax.random.normal(kk, (BS, HKV, seq, DIM), jnp.bfloat16)
    v = jax.random.normal(kv, (BS, HKV, seq, DIM), jnp.bfloat16)
    fl = attention_flops(BS, HQ, seq, seq, DIM, causal=True)

    print(f"== causal bf16 GQA s{seq} d{DIM} (valid-FLOP TF/s) ==")
    if not args.skip_baseline:
        base = jax.jit(functools.partial(
            flash_attention, causal=True,
            config=FlashConfig(block_q=2048, block_kv=512, kv_splits=2)))
        r = run_benchmark(base, q, k, v, rounds=args.rounds)
        print(f"worklist (2048,512,2): "
              f"{fl / (r['min_ms'] / 1e3) / 1e12:8.1f}", flush=True)

    if args.window is not None:
        # window accounting: ramp + full-width rows, valid FLOPs only
        w = args.window
        valid = w * (w + 1) // 2 + max(0, seq - w) * w
        fl = 4 * BS * HQ * DIM * valid

    for sub, lf in zip(args.subs, leaves):
        cfg = FlashConfig(kernel=args.kernel, tri_sub=sub, tri_leaf=lf)
        fn = jax.jit(functools.partial(flash_attention, causal=True,
                                       window=args.window, config=cfg))
        try:
            r = run_benchmark(fn, q, k, v, rounds=args.rounds)
            print(f"{args.kernel} sub={sub:4d} leaf={lf:4d}: "
                  f"{fl / (r['min_ms'] / 1e3) / 1e12:8.1f}", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"{args.kernel} sub={sub:4d} leaf={lf:4d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    if args.int8:
        qk, qv = quantize_kv(k, v, "int8")
        from tiny_flash_attention_tpu.ops.flash import _flash_fwd_impl

        for sub, lf in zip(args.subs, leaves):
            cfg = FlashConfig(kernel="tri", tri_sub=sub, tri_leaf=lf)
            fn = jax.jit(lambda q, kp, ks, vp, vs, cfg=cfg: _flash_fwd_impl(
                q, kp, vp, None, True, DIM ** -0.5, cfg,
                k_scales=ks, v_scales=vs)[0])
            r = run_benchmark(fn, q, qk.values, qk.scales, qv.values,
                              qv.scales, rounds=args.rounds)
            print(f"tri int8 sub={sub:4d} leaf={lf:4d}: "
                  f"{fl / (r['min_ms'] / 1e3) / 1e12:8.1f}", flush=True)


if __name__ == "__main__":
    main()
