#!/usr/bin/env python
"""Row-loop kernel A/B vs the work-list flagship on the headline config."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.flash_rowloop import flash_attention_rowloop
from tiny_flash_attention_tpu.utils.benchmarking import (
    run_benchmark, attention_flops)

BS, HQ, HKV, SEQ, DIM = 2, 8, 2, 2048, 128


def main():
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (BS, HQ, SEQ, DIM), jnp.bfloat16)
    k = jax.random.normal(kk, (BS, HKV, SEQ, DIM), jnp.bfloat16)
    v = jax.random.normal(kv, (BS, HKV, SEQ, DIM), jnp.bfloat16)
    fl_c = attention_flops(BS, HQ, SEQ, SEQ, DIM, causal=True)
    fl_n = attention_flops(BS, HQ, SEQ, SEQ, DIM, causal=False)

    # correctness spot-check on chip first
    cfg = FlashConfig(block_q=2048, block_kv=512, kv_splits=2)
    ref = flash_attention(q, k, v, causal=True, config=cfg)
    got, _ = flash_attention_rowloop(q, k, v, causal=True,
                                     config=cfg, interpret=False)
    err = float(np.max(np.abs(np.asarray(got, np.float32)
                              - np.asarray(ref, np.float32))))
    print(f"rowloop-vs-flagship maxerr: {err:.2e}", flush=True)

    import sys
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    variants = []
    if phase in ("all", "causal"):
        variants += [(bq, ch, u, sl, True) for bq, ch, u, sl in [
            (2048, 512, 2, True), (2048, 256, 2, True),
            (2048, 256, 1, True), (1024, 256, 1, True),
            (1024, 256, 2, True), (1024, 128, 1, True),
        ]]
    if phase in ("all", "nc"):
        variants += [(bq, ch, u, False, False) for bq, ch, u in [
            (4096, 512, 2), (8192, 512, 2), (4096, 512, 4),
            (8192, 1024, 4),
        ]]
    for bq, chunk, unroll, sloop, causal in variants:
        c = FlashConfig(block_q=bq, block_kv=512)
        def fn(q, k, v, *, _c=c, _ch=chunk, _u=unroll, _s=sloop,
               causal=causal):
            return flash_attention_rowloop(
                q, k, v, causal=causal, config=_c, chunk=_ch, unroll=_u,
                single_loop=_s, interpret=False)[0]
        try:
            r = run_benchmark(jax.jit(fn), q, k, v, rounds=4)
            tf = (fl_c if causal else fl_n) / (r["min_ms"] / 1e3) / 1e12
            print(f"rowloop bq{bq} chunk{chunk} u{unroll} "
                  f"single={sloop} causal={causal}: {tf:.1f} TF/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"rowloop bq{bq} chunk{chunk} u{unroll} single={sloop} "
                  f"causal={causal}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
