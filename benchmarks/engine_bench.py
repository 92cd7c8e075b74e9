#!/usr/bin/env python
"""End-to-end continuous-batching decode benchmark (one JSON line per run).

Measures what a serving deployment sees: tokens/s out of the full engine
loop — embedding, QKV+RoPE, paged-cache append, fused-page decode attention,
MLP, sampling, host-side scheduling — not just the attention kernel. Run:
python benchmarks/engine_bench.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.models.engine import InferenceEngine, Request


def bench_engine(kv_format: str, *, batch=8, prompt_len=512,
                 decode_steps=256, weight_format=None):
    cfg = T.ModelConfig(
        vocab_size=32768, d_model=1024, n_layers=4, n_q_heads=8,
        n_kv_heads=2, d_head=128, d_ff=4096, dtype=jnp.bfloat16)
    params = T.init_params(cfg, jax.random.key(0))
    if weight_format:
        params = T.quantize_params(params, weight_format)
    eng = InferenceEngine(cfg, params, num_pages=512, page_size=128,
                          max_seqs=batch, pages_per_seq=32,
                          kv_format=kv_format)
    rng = np.random.default_rng(0)
    for _ in range(batch):
        prompt = rng.integers(0, cfg.vocab_size, prompt_len).tolist()
        eng.add_request(
            Request(prompt, max_new_tokens=decode_steps + 256))

    # per-token host loop baseline (what the chunked loop replaces)
    for _ in range(4):
        eng.step()       # warmup/compile
    t0 = time.perf_counter()
    for _ in range(16):
        eng.step()
    dt_step = (time.perf_counter() - t0) / 16

    chunk = 128
    eng.steps(chunk)     # warmup (compile the chunked decode loop)
    t0 = time.perf_counter()
    n_tokens = 0
    for _ in range(decode_steps // chunk):
        n_tokens += sum(len(v) for v in eng.steps(chunk).values())
    jax.block_until_ready(eng.cache.pages[0])
    dt = time.perf_counter() - t0

    tag = f"{kv_format}" + (f"_w{weight_format}" if weight_format else "")
    print(json.dumps({
        "metric": f"engine_decode_{tag}_b{batch}_tokens_per_s",
        "value": round(n_tokens / dt, 1),
        "unit": "tokens/s",
        "vs_baseline": round((n_tokens / dt) / (batch / dt_step), 3),
    }))


if __name__ == "__main__":
    bench_engine("bf16")
    bench_engine("int8")
    bench_engine("int8", weight_format="int8")
