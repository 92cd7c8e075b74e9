#!/usr/bin/env python
"""Training-step benchmark: tokens/s through the GSPMD train step.

Runs the full sharded training step (forward through the Pallas flash
kernel, fused single-pass backward, Adam update) on whatever mesh the
visible devices give (one chip here; the same code path scales over
(data, model) meshes — see tests/test_parallel_train.py for the 8-device
parity check). One JSON line per config.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.parallel.sharded import make_mesh
from tiny_flash_attention_tpu.parallel.train import make_train_step


def bench_train(*, batch=4, seq=2048, rounds=5, iters=20):
    cfg = T.ModelConfig(
        vocab_size=32768, d_model=1024, n_layers=4, n_q_heads=8,
        n_kv_heads=2, d_head=128, d_ff=4096, dtype=jnp.bfloat16,
        attn_impl="flash")
    mesh = make_mesh(len(jax.devices()))
    params = T.init_params(cfg, jax.random.key(0))
    train_step, init_state = make_train_step(cfg, mesh)
    sparams, sopt = init_state(params)
    tokens = jax.random.randint(jax.random.key(1), (batch, seq), 0,
                                cfg.vocab_size)

    sparams, sopt, loss = train_step(sparams, sopt, tokens)  # compile
    jax.block_until_ready(loss)

    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            sparams, sopt, loss = train_step(sparams, sopt, tokens)
        # relay-safe fence: device->host readback of the loss
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / iters)

    toks = batch * seq
    print(json.dumps({
        "metric": f"train_step_bf16_b{batch}_s{seq}_tokens_per_s",
        "value": round(toks / best, 1),
        "unit": "tokens/s",
    }))


if __name__ == "__main__":
    bench_train()
    # long-context row: fwd rides the q-banded triangle sweep, backward
    # the banded triangle grid (dk/dv accumulated across band steps)
    bench_train(batch=1, seq=8192, iters=8)
