#!/usr/bin/env python
"""Decode-step component profile: where does a paged engine step go?

Times the REAL decode loop and ablated variants (attention swapped for a
zero read, cache append skipped, both) at a short and a long context, so
the paged-specific overhead decomposes into attention-kernel vs
append-scatter vs shared-model cost — the round-2 verdict asked for the
0.35x short-prompt ratio vs the stock dense loop to be explained or fixed.

Usage: python benchmarks/engine_profile.py [--prompt 512]
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

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.models.inference import (
    _append_rows, prefill_forward_batched)
from tiny_flash_attention_tpu.ops.paged_fused import (
    fused_paged_decode_attention)


def build(cfg, params, *, batch, prompt_len, pages_per_seq, ps=128,
          skip_attn=False, skip_append=False, pages_per_block=None):
    """A standalone chunked decode loop with ablation switches (mirrors
    inference.decode_loop's body, greedy path)."""

    def chunk(pages, tokens, positions, page_table, n):
        cap = page_table.shape[1] * ps

        def body(carry, _):
            pages, tokens, positions = carry
            B = tokens.shape[0]
            x = params["embed"][tokens][:, None, :].astype(cfg.dtype)
            lengths = jnp.minimum(positions + 1, cap)
            page_ids = jnp.take_along_axis(
                page_table,
                ((positions // ps) % page_table.shape[1])[:, None],
                axis=1)[:, 0]
            rows = positions % ps
            new_pages = []
            for li in range(cfg.n_layers):
                layer = jax.tree_util.tree_map(lambda a: a[li],
                                               params["layers"])
                q, k, v = T.qkv_proj(cfg, layer, x, positions[:, None])
                lp = pages[li]
                if not skip_append:
                    lp = _append_rows(lp, k[:, :, 0], v[:, :, 0], page_ids,
                                      rows, page_size=ps, fmt="bf16")
                new_pages.append(lp)
                if skip_attn:
                    o = jnp.zeros((B, cfg.n_q_heads, cfg.d_head),
                                  jnp.float32) + q[:, :, 0] * 1e-6
                else:
                    o, _ = fused_paged_decode_attention(
                        q[:, :, 0], lp, lengths, page_table, page_size=ps,
                        pages_per_block=pages_per_block)
                o = o.reshape(B, 1, cfg.n_q_heads * cfg.d_head).astype(
                    cfg.dtype)
                x = x + T._proj(o, layer["wo"])
                x = T.mlp_block(cfg, layer, x)
            x = T.rms_norm(x, params["final_norm"], cfg.rms_eps)
            logits = T._proj(x[:, 0], params["lm_head"])
            tokens = jnp.argmax(logits, -1).astype(jnp.int32)
            return (new_pages, tokens, positions + 1), tokens

        (pages, tokens, positions), out = jax.lax.scan(
            body, (pages, tokens, positions), None, length=n)
        return pages, tokens, positions, out

    return jax.jit(chunk, static_argnums=(4,), donate_argnums=(0,))


def time_loop(fn, pages, tok, pos, table, n, reps=6):
    pages, tok, pos, out = fn(pages, tok, pos, table, n)[0:3] + (None,)
    pages, tok, pos, out = fn(pages, tok, pos, table, n)   # warm
    np.asarray(out[-1])
    fences = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(out[-1])
        fences.append(time.perf_counter() - t0)
    fence = min(fences)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        pages, tok, pos, out = fn(pages, tok, pos, table, n)
        np.asarray(out[-1])
        best = min(best, time.perf_counter() - t0 - fence)
    return best / n * 1e3   # ms/step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()
    cfg = T.ModelConfig(
        vocab_size=32768, d_model=1024, n_layers=4, n_q_heads=8,
        n_kv_heads=2, d_head=128, d_ff=4096, dtype=jnp.bfloat16)
    params = T.init_params(cfg, jax.random.key(0))
    B, ps = args.batch, 128
    prompt = args.prompt
    # bucketed table like engine.steps(): pow2 pages covering prompt+chunk
    need_pages = -(-(prompt + args.chunk + 32) // ps)
    pps = 1 << max(0, (need_pages - 1)).bit_length()

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, prompt)),
                       jnp.int32)
    logits, ks, vs = prefill_forward_batched(cfg, params, toks)
    num_pages = B * pps + 1
    pages0 = []
    for li in range(cfg.n_layers):
        arr = jnp.zeros((cfg.n_kv_heads, num_pages, 2 * ps, cfg.d_head),
                        cfg.dtype)
        pages0.append(arr)
    table = jnp.asarray(
        (np.arange(B * pps).reshape(B, pps) + 1).astype(np.int32))
    tok0 = jnp.argmax(logits[:, prompt - 1], -1).astype(jnp.int32)
    pos0 = jnp.full((B,), prompt, jnp.int32)

    rows = {}
    variants = [
        ("full", {}),
        ("no_attn", {"skip_attn": True}),
        ("no_append", {"skip_append": True}),
        ("model_only", {"skip_attn": True, "skip_append": True}),
        ("full_ppb4", {"pages_per_block": min(4, pps)}),
        ("full_ppb2", {"pages_per_block": min(2, pps)}),
    ]
    for name, kw in variants:
        fn = build(cfg, params, batch=B, prompt_len=prompt,
                   pages_per_seq=pps, **kw)
        ms = time_loop(fn, [p + 0 for p in pages0], tok0, pos0, table,
                       args.chunk)
        rows[name] = round(ms, 4)
        print(json.dumps({"metric": f"decode_step_{name}_s{prompt}",
                          "value": round(ms, 4), "unit": "ms/step"}),
              flush=True)
    print(json.dumps({
        "metric": f"decode_step_breakdown_s{prompt}",
        "attn_ms": round(rows["full"] - rows["no_attn"], 4),
        "append_ms": round(rows["full"] - rows["no_append"], 4),
        "model_ms": rows["model_only"],
        "unit": "ms/step",
    }))


if __name__ == "__main__":
    main()
