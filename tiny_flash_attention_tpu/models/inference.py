"""Inference forward paths: prefill (cache-filling) and paged decode step.

Separated from transformer.py because these paths thread cache state and use
the decode kernels; the training/eval `forward` stays cache-free.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.models.kv_cache import _quant_rows
from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.paged_fused import fused_paged_decode_attention


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill_forward_batched(cfg: T.ModelConfig, params: dict,
                            tokens: jax.Array):
    """tokens (B, L) -> (logits (B, L, V), k_layers, v_layers).

    k_layers/v_layers: (n_layers, B, hkv, L, d) post-RoPE, ready for cache
    writes. Runs the flash kernel causally over the full (padded) prompts;
    right-padding garbage is harmless — cache writes slice by true length
    and padded rows never mix into earlier positions under the causal mask.
    """
    b, s = tokens.shape
    positions = jnp.arange(s, dtype=jnp.int32)
    x = params["embed"][tokens].astype(cfg.dtype)

    def body(x, layer):
        q, k, v = T.qkv_proj(cfg, layer, x, positions)
        o = T._attention(cfg, q, k, v, causal=True)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.n_q_heads * cfg.d_head)
        x = x + T._proj(o, layer["wo"])
        x = T.mlp_block(cfg, layer, x)
        return x, (k, v)   # (B, hkv, s, d)

    x, (ks, vs) = jax.lax.scan(body, x, params["layers"])
    x = T.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = T._proj(x, params["lm_head"]).astype(jnp.float32)
    return logits, ks, vs


@functools.partial(jax.jit, static_argnames=("cfg", "segment_starts"))
def prefill_forward_packed(cfg: T.ModelConfig, params: dict,
                           tokens: jax.Array, seg_ids: jax.Array,
                           positions: jax.Array, *, segment_starts):
    """Ragged prompts PACKED into one row: tokens/seg_ids (1, L_total),
    positions (L_total,) restarting at each prompt (RoPE), segment_starts
    a static tuple of pack offsets.

    Attention runs the flagship kernel with segment masking AND a
    work-list pruned to the block-diagonal (the host knows the layout), so
    the cost is sum(L_i^2)/2 — admission stops paying (B * L_max^2)/2 when
    prompt lengths diverge. Returns (logits (1, L, V), ks, vs) shaped like
    prefill_forward_batched with B=1.
    """
    b, s = tokens.shape
    x = params["embed"][tokens].astype(cfg.dtype)

    def body(x, layer):
        q, k, v = T.qkv_proj(cfg, layer, x, positions)
        o = flash_attention(q, k, v, causal=True,
                            segment_ids=(seg_ids, seg_ids),
                            segment_starts=segment_starts)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.n_q_heads * cfg.d_head)
        x = x + T._proj(o, layer["wo"])
        x = T.mlp_block(cfg, layer, x)
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(body, x, params["layers"])
    x = T.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = T._proj(x, params["lm_head"]).astype(jnp.float32)
    return logits, ks, vs


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill_forward_jagged(cfg: T.ModelConfig, params: dict,
                           tokens: jax.Array, seq_lengths: jax.Array):
    """Heterogeneous admission batch WITHOUT packing: tokens (B, L_pad)
    right-padded per request, seq_lengths (B,) RUNTIME lengths.

    Attention runs the row-loop kernel (ops/flash_rowloop.py) whose
    dynamic KV trip count clamps to each row's length — cost is
    ~sum(L_i^2)/2 like packed admission, but lengths are runtime values:
    ONE compiled executable per (B, L_pad) bucket serves every length
    mix, where prefill_forward_packed retraces per pack pattern (its
    compile-cost note). Returns (logits (B, L_pad, V), ks, vs); rows
    beyond a request's length are garbage to slice off.
    """
    from tiny_flash_attention_tpu.ops.flash_rowloop import (
        flash_attention_rowloop)

    b, s = tokens.shape
    positions = jnp.arange(s, dtype=jnp.int32)
    x = params["embed"][tokens].astype(cfg.dtype)

    def body(x, layer):
        q, k, v = T.qkv_proj(cfg, layer, x, positions)
        o, _ = flash_attention_rowloop(q, k, v, causal=True,
                                       seq_lengths=seq_lengths)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.n_q_heads * cfg.d_head)
        x = x + T._proj(o, layer["wo"])
        x = T.mlp_block(cfg, layer, x)
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(body, x, params["layers"])
    x = T.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = T._proj(x, params["lm_head"]).astype(jnp.float32)
    return logits, ks, vs


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill_forward(cfg: T.ModelConfig, params: dict, tokens: jax.Array):
    """tokens (1, L) -> (logits (1, L, V), k_layers, v_layers).

    Single-prompt convenience over prefill_forward_batched; k_layers/
    v_layers squeeze to (n_layers, hkv, L, d).
    """
    logits, ks, vs = prefill_forward_batched(cfg, params, tokens)
    return logits, ks[:, 0], vs[:, 0]


def _decode_core(cfg: T.ModelConfig, params: dict, pages: List[jax.Array],
                 tokens: jax.Array, positions: jax.Array,
                 page_table: jax.Array, *, page_size: int, fmt: str):
    """Traceable single decode step; see decode_step for the contract."""
    B = tokens.shape[0]
    ps = page_size
    x = params["embed"][tokens][:, None, :].astype(cfg.dtype)   # (B, 1, dm)
    lengths = positions + 1
    if cfg.attn_window is None:
        # chunked-decode overrun of a finished request can push positions
        # past table capacity; the WRITE wraps onto the slot's own pages
        # (harmless, the tokens are discarded) but the attention length
        # must not index pages beyond the table width — an out-of-bounds
        # page id becomes an out-of-bounds DMA (device fault), not an error
        lengths = jnp.minimum(lengths, page_table.shape[1] * ps)
    # ring indexing: logical page wraps modulo the table width (identity
    # for non-windowed configs; see kv_cache.append_tokens)
    page_ids = jnp.take_along_axis(
        page_table, ((positions // ps) % page_table.shape[1])[:, None],
        axis=1)[:, 0]                                           # (B,)
    rows = positions % ps

    new_pages = []
    for li in range(len(pages)):
        layer = jax.tree_util.tree_map(lambda a: a[li], params["layers"])
        q, k, v = T.qkv_proj(cfg, layer, x, positions[:, None])
        # q (B, hq, 1, d); k/v (B, hkv, 1, d)
        lp = _append_rows(pages[li], k[:, :, 0], v[:, :, 0], page_ids, rows,
                          page_size=ps, fmt=fmt)
        new_pages.append(lp)
        o, _ = fused_paged_decode_attention(
            q[:, :, 0], lp, lengths, page_table, page_size=ps,
            window=cfg.attn_window)
        o = o.reshape(B, 1, cfg.n_q_heads * cfg.d_head).astype(cfg.dtype)
        x = x + T._proj(o, layer["wo"])
        x = T.mlp_block(cfg, layer, x)

    x = T.rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = T._proj(x[:, 0], params["lm_head"]).astype(jnp.float32)
    return logits, new_pages


@functools.partial(jax.jit, static_argnames=("cfg", "page_size", "fmt"),
                   donate_argnums=(2,))
def decode_step(cfg: T.ModelConfig, params: dict, pages: List[jax.Array],
                tokens: jax.Array, positions: jax.Array,
                page_table: jax.Array, *, page_size: int, fmt: str):
    """One decode step for all slots (fixed shape = continuous batching).

    tokens (B,) int32: last sampled token per slot.
    positions (B,) int32: index of this token (== old cache length).
    page_table (B, pages_per_seq) int32.
    Returns (logits (B, V), new_pages). Each layer appends its new KV row
    into its page array BEFORE attending, so attention covers positions+1
    tokens including the current one (causal decode semantics, ref
    c/csrc/attn.cpp:51-53 kv_len = i + 1 + gap).
    """
    return _decode_core(cfg, params, pages, tokens, positions, page_table,
                        page_size=page_size, fmt=fmt)


@functools.partial(jax.jit, static_argnames=("cfg", "page_size", "fmt",
                                             "n_steps", "greedy"),
                   donate_argnums=(2,))
def decode_loop(cfg: T.ModelConfig, params: dict, pages: List[jax.Array],
                tokens: jax.Array, positions: jax.Array,
                page_table: jax.Array, temps: jax.Array, key: jax.Array,
                *, page_size: int, fmt: str, n_steps: int,
                greedy: bool = False):
    """n_steps decode steps + on-device sampling in ONE dispatch.

    The host-driven step() loop pays 2-3 host<->device round trips per
    token, which dominates when the per-step compute is sub-millisecond
    (and is catastrophic through this host's ~25 ms relay). This runs the
    whole chunk device-side as a lax.scan — the continuous-batching
    scheduler only syncs once per chunk, trading up to n_steps of overrun
    past an EOS for the dispatch amortization (the standard chunked-decode
    tradeoff in TPU serving loops).

    Returns (new_pages, sampled (n_steps, B) int32, new_key).
    """
    def body(carry, _):
        pages, tokens, positions, key = carry
        logits, pages = _decode_core(cfg, params, pages, tokens, positions,
                                     page_table, page_size=page_size,
                                     fmt=fmt)
        if greedy:
            # static greedy fast path: categorical sampling generates a
            # (B, vocab) gumbel field per step — measured 0.11 ms/step at
            # vocab 32k — that an all-temperature-zero batch never uses
            tokens = jnp.argmax(logits, -1).astype(jnp.int32)
        else:
            key, sub = jax.random.split(key)
            # per-row keys: the stream is a function of (key chain, slot),
            # so data-parallel shards reproduce it exactly (serve.py)
            tokens = sample_tokens_rowwise(
                logits, sub, temps, jnp.arange(logits.shape[0]))
        return (pages, tokens, positions + 1, key), tokens

    (pages, _, _, key), sampled = jax.lax.scan(
        body, (pages, tokens, positions, key), None, length=n_steps)
    return pages, sampled, key


def _append_rows(pages, k_new, v_new, page_ids, rows, *, page_size, fmt):
    """pages (hkv, np, prows, d); k_new/v_new (B, hkv, d).

    Dispatches the XLA scatter decomposition (_append_rows_scatter). The
    Pallas in-place DMA append (ops/paged_fused.py: fused_page_append)
    would replace it with 2-4 overlapped DMAs per (head, seq), but the
    current Mosaic toolchain rejects single-row DMA windows into tiled
    bf16/int8 buffers outright ("slice shape must be aligned to tiling"),
    so it cannot compile on this hardware — it stays an interpret-mode
    surface (tests/test_paged_fused.py) until sub-tile DMA lands. The
    scatter path is the round-2 measured default (engine bf16 7.3k /
    int8 10.9k tokens/s include it).
    """
    return _append_rows_scatter(pages, k_new, v_new, page_ids, rows,
                                page_size=page_size, fmt=fmt)


def _append_rows_scatter(pages, k_new, v_new, page_ids, rows, *, page_size,
                         fmt):
    """XLA-scatter token append — the dispatched decode-loop path (see
    _append_rows) and the oracle the Pallas DMA kernel is tested against."""
    ps = page_size
    k_new = jnp.swapaxes(k_new, 0, 1)    # (hkv, B, d)
    v_new = jnp.swapaxes(v_new, 0, 1)
    if fmt == "int8":
        d = pages.shape[-1]
        sr = 4 * max(1, ps // d)   # scale rows per side (paged_fused doc)
        kq, ks = _quant_rows(k_new)
        vq, vs = _quant_rows(v_new)
        ksb = jax.lax.bitcast_convert_type(ks, jnp.int8)   # (hkv, B, 4)
        vsb = jax.lax.bitcast_convert_type(vs, jnp.int8)
        pages = pages.at[:, page_ids, rows, :].set(kq)
        pages = pages.at[:, page_ids, ps + rows, :].set(vq)
        srow = 4 * (rows // d)
        lane = rows % d
        for j in range(4):
            pages = pages.at[:, page_ids, 2 * ps + srow + j, lane].set(
                ksb[..., j])
            pages = pages.at[:, page_ids, 2 * ps + sr + srow + j, lane].set(
                vsb[..., j])
        return pages
    pages = pages.at[:, page_ids, rows, :].set(k_new.astype(pages.dtype))
    pages = pages.at[:, page_ids, ps + rows, :].set(v_new.astype(pages.dtype))
    return pages


@jax.jit
def sample_tokens(logits: jax.Array, key: jax.Array,
                  temperature: jax.Array) -> jax.Array:
    """Greedy when temperature == 0, else categorical. temperature: scalar
    or per-row (B,) against logits (..., V)."""
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32),
                         logits.shape[:-1])
    greedy = jnp.argmax(logits, axis=-1)
    scaled = logits / jnp.maximum(t, 1e-6)[..., None]
    sampled = jax.random.categorical(key, scaled, axis=-1)
    return jnp.where(t <= 0.0, greedy, sampled).astype(jnp.int32)


@jax.jit
def sample_tokens_rowwise(logits: jax.Array, key: jax.Array,
                          temperature: jax.Array,
                          row_ids: jax.Array) -> jax.Array:
    """sample_tokens with PER-ROW derived keys: row r samples with
    fold_in(key, row_ids[r]), so the stream depends only on (key, global
    slot id, logits) — invariant to how the batch is sharded. A
    data-parallel group passing its global row ids reproduces exactly the
    tokens the single-chip loop samples for those slots (tested in
    test_serve_sharded)."""
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32),
                         logits.shape[:-1])
    greedy = jnp.argmax(logits, axis=-1)
    scaled = logits / jnp.maximum(t, 1e-6)[..., None]
    keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(row_ids)
    sampled = jax.vmap(
        lambda k, l: jax.random.categorical(k, l))(keys, scaled)
    return jnp.where(t <= 0.0, greedy, sampled).astype(jnp.int32)
