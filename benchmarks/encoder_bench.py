#!/usr/bin/env python
"""Encoder-family throughput: embedding tokens/s through the non-causal
flash path (models/encoder.py). One JSON line per config."""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.models import encoder as E
from tiny_flash_attention_tpu.models import transformer as T


def bench(*, batch=8, seq=2048, rounds=5, iters=10):
    cfg = T.ModelConfig(
        vocab_size=32768, d_model=1024, n_layers=4, n_q_heads=8,
        n_kv_heads=2, d_head=128, d_ff=4096, dtype=jnp.bfloat16)
    params = T.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)),
                         jnp.int32)
    lengths = jnp.asarray(
        rng.integers(seq // 2, seq + 1, batch), jnp.int32)

    fn = jax.jit(lambda t, ln: E.embed_texts(cfg, params, t, ln))
    emb = fn(tokens, lengths)
    np.asarray(emb[0, :1])                        # compile + fence

    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            emb = fn(tokens, lengths)
        np.asarray(emb[0, :1])                    # relay-safe fence
        best = min(best, (time.perf_counter() - t0) / iters)

    toks = batch * seq
    print(json.dumps({
        "metric": f"encoder_embed_bf16_b{batch}_s{seq}_tokens_per_s",
        "value": round(toks / best, 1),
        "unit": "tokens/s",
    }), flush=True)


if __name__ == "__main__":
    bench()
    bench(batch=32, seq=512)
