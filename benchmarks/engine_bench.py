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


def _fence_ms(eng):
    t0 = time.perf_counter()
    np.asarray(eng.cache.pages[0][0, 0, 0, :1])
    return (time.perf_counter() - t0) * 1e3


def bench_engine(kv_format: str, *, batch=8, prompt_len=512,
                 decode_steps=256, weight_format=None, tag_extra="",
                 pages_per_seq=32):
    cfg = T.ModelConfig(
        vocab_size=32768, d_model=1024, n_layers=4, n_q_heads=8,
        n_kv_heads=2, d_head=128, d_ff=4096, dtype=jnp.bfloat16)
    params = T.init_params(cfg, jax.random.key(0))
    if weight_format:
        params = T.quantize_params(params, weight_format)
    eng = InferenceEngine(cfg, params, num_pages=batch * pages_per_seq + 8,
                          page_size=128, max_seqs=batch,
                          pages_per_seq=pages_per_seq,
                          kv_format=kv_format)
    rng = np.random.default_rng(0)
    chunk = 128
    n_chunks = max(4, decode_steps // chunk)
    # budget exactly the timed chunks (+warmup steps) so admission stays
    # within page-table capacity at long prompts
    budget = min(n_chunks * chunk + 32,
                 pages_per_seq * 128 - prompt_len)   # page-table capacity
    for _ in range(batch):
        prompt = rng.integers(0, cfg.vocab_size, prompt_len).tolist()
        eng.add_request(Request(prompt, max_new_tokens=budget))

    # per-token host loop baseline (what the chunked loop replaces)
    for _ in range(4):
        eng.step()       # warmup/compile
    t0 = time.perf_counter()
    for _ in range(16):
        eng.step()
    dt_step = (time.perf_counter() - t0) / 16

    eng.steps(chunk)     # warmup (compile the chunked decode loop)
    # steps() syncs internally (np.asarray on the sampled tokens), so each
    # call carries exactly one relay fence (~25 ms, ms-level jitter);
    # measure it on ready data and subtract, and take the best chunk to
    # shed one-off relay hiccups.
    fence = min(_fence_ms(eng) for _ in range(5)) / 1e3
    rates = []
    for _ in range(n_chunks - 1):
        t0 = time.perf_counter()
        got = eng.steps(chunk)
        dt_i = time.perf_counter() - t0 - fence
        n_i = sum(len(v) for v in got.values())
        if n_i and dt_i > 0:
            rates.append(n_i / dt_i)
    best = max(rates)
    median = float(np.median(rates))

    tag = f"{kv_format}" + (f"_w{weight_format}" if weight_format else "") \
        + tag_extra
    print(json.dumps({
        "metric": f"engine_decode_{tag}_b{batch}_tokens_per_s",
        "value": round(best, 1),            # best chunk, fence-subtracted
        "median": round(median, 1),          # typical chunk (relay jitter in)
        "unit": "tokens/s",
        "vs_baseline": round(best / (batch / dt_step), 3),
    }))
    return best


def bench_stock_dense(*, batch=8, prompt_len=512, decode_steps=256,
                      tag_extra=""):
    """External yardstick: a stock-JAX dense-cache decode loop at the SAME
    model config — what a user would write without this framework: a
    (layers, B, hkv, max_len, d) cache updated with dynamic_update_slice,
    full-width masked einsum attention, greedy sampling, chunked in one
    lax.scan dispatch (so the comparison isolates the cache/attention
    design, not dispatch counts)."""
    from tiny_flash_attention_tpu.models.inference import (
        prefill_forward_batched)

    cfg = T.ModelConfig(
        vocab_size=32768, d_model=1024, n_layers=4, n_q_heads=8,
        n_kv_heads=2, d_head=128, d_ff=4096, dtype=jnp.bfloat16)
    params = T.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                    (batch, prompt_len)), jnp.int32)
    S_max = prompt_len + decode_steps + 128
    logits, ks, vs = prefill_forward_batched(cfg, params, toks)
    L = cfg.n_layers
    cache_k = jnp.zeros((L, batch, cfg.n_kv_heads, S_max, cfg.d_head),
                        cfg.dtype).at[:, :, :, :prompt_len].set(ks)
    cache_v = jnp.zeros_like(cache_k).at[:, :, :, :prompt_len].set(vs)
    tok0 = jnp.argmax(logits[:, prompt_len - 1], -1).astype(jnp.int32)

    def attn(q, ck, cv, pos):
        # q (B, hq, 1, d); ck/cv (B, hkv, S, d); valid cols <= pos
        group = cfg.n_q_heads // cfg.n_kv_heads
        kk = jnp.repeat(ck, group, axis=1)
        vv = jnp.repeat(cv, group, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                       preferred_element_type=jnp.float32)
        s = s / np.sqrt(cfg.d_head)
        valid = jnp.arange(S_max)[None, None, None, :] <= pos
        s = jnp.where(valid, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, vv)

    def chunk(cache_k, cache_v, tokens, pos, n):
        def body(carry, _):
            ck, cv, tok, pos = carry
            x = params["embed"][tok][:, None, :].astype(cfg.dtype)
            for li in range(L):
                layer = jax.tree_util.tree_map(lambda a: a[li],
                                               params["layers"])
                q, k, v = T.qkv_proj(cfg, layer, x, pos[None, None])
                ck = ck.at[li, :, :, pos].set(k[:, :, 0])
                cv = cv.at[li, :, :, pos].set(v[:, :, 0])
                o = attn(q, ck[li], cv[li], pos)
                o = o.reshape(batch, 1, cfg.n_q_heads * cfg.d_head).astype(
                    cfg.dtype)
                x = x + T._proj(o, layer["wo"])
                x = T.mlp_block(cfg, layer, x)
            x = T.rms_norm(x, params["final_norm"], cfg.rms_eps)
            logits = T._proj(x[:, 0], params["lm_head"])
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return (ck, cv, tok, pos + 1), tok

        (ck, cv, tok, pos), out = jax.lax.scan(
            body, (cache_k, cache_v, tokens, pos), None, length=n)
        return ck, cv, tok, pos, out

    step = jax.jit(chunk, static_argnums=(4,), donate_argnums=(0, 1))
    n = 128
    cache_k, cache_v, tok, pos, out = step(
        cache_k, cache_v, tok0, jnp.int32(prompt_len), n)   # warmup
    np.asarray(out[-1])
    fences = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(out[-1])
        fences.append(time.perf_counter() - t0)
    fence = min(fences)
    dts = []
    for _ in range(max(4, decode_steps // n)):
        t0 = time.perf_counter()
        cache_k, cache_v, tok, pos, out = step(cache_k, cache_v, tok, pos, n)
        np.asarray(out[-1])
        dts.append(time.perf_counter() - t0 - fence)
    rate = out.size / min(dts)
    print(json.dumps({
        "metric": f"stock_dense_decode_b{batch}{tag_extra}_tokens_per_s",
        "value": round(rate, 1),            # best chunk, fence-subtracted
        "median": round(out.size / float(np.median(dts)), 1),
        "unit": "tokens/s",
    }))
    return rate


if __name__ == "__main__":
    # Short-context regime (prompt 512): a preallocated dense cache is the
    # favorable design here — one fused attention read beats a page-table
    # gather chain. Reported as-is; the paged engine's case is memory
    # (pages shared across slots instead of batch x max_len preallocation),
    # heterogeneous-length continuous batching, and long contexts below.
    stock = bench_stock_dense()
    bf16 = bench_engine("bf16")
    bench_engine("int8")
    bench_engine("int8", weight_format="int8")
    print(json.dumps({
        "metric": "engine_bf16_vs_stock_dense_decode",
        "value": round(bf16 / stock, 3),
        "unit": "x",
    }))
    # Long-context regime (prompt 3584): the dense baseline's full-width
    # masked attention scales with max_len while the paged gather scales
    # with actual length.
    stock_l = bench_stock_dense(prompt_len=3584, decode_steps=128,
                                tag_extra="_s3584")
    bf16_l = bench_engine("bf16", prompt_len=3584, decode_steps=128,
                          tag_extra="_s3584")
    print(json.dumps({
        "metric": "engine_bf16_vs_stock_dense_decode_s3584",
        "value": round(bf16_l / stock_l, 3),
        "unit": "x",
    }))
    # North-star regime (BASELINE config 2): seqlen-8k decode, INT8 paged
    # KV. The dense yardstick preallocates batch x 8k+ and reads the full
    # width every step; the paged engine gathers only live pages and (int8)
    # half the bytes.
    stock_8k = bench_stock_dense(prompt_len=7936, decode_steps=128,
                                 tag_extra="_s8k")
    bf16_8k = bench_engine("bf16", prompt_len=7936, decode_steps=128,
                           tag_extra="_s8k", pages_per_seq=64)
    int8_8k = bench_engine("int8", prompt_len=7936, decode_steps=128,
                           tag_extra="_s8k", pages_per_seq=64)
    print(json.dumps({
        "metric": "engine_bf16_vs_stock_dense_decode_s8k",
        "value": round(bf16_8k / stock_8k, 3),
        "unit": "x",
    }))
    print(json.dumps({
        "metric": "engine_int8_vs_stock_dense_decode_s8k",
        "value": round(int8_8k / stock_8k, 3),
        "unit": "x",
    }))
