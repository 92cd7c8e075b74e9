"""Encoder model family: bidirectional transformer for embeddings.

The decoder family (transformer.py) exercises the causal kernel tier;
this is the NON-causal consumer — a BERT/embedding-style encoder over
the same param pytree + pure-function shape, dispatching the flagship
kernel with causal=False (which rides the whole-sequence row-fold
geometry, configs._DISPATCH_NONCAUSAL). The reference has no model
layer at all (SURVEY.md §1); both families are north-star extensions,
and this one makes the non-causal forward path a first-class serving
surface (embedding/retrieval workloads) rather than a bench-only row.

Padding is handled the framework's way: segment ids. Valid tokens get
segment 1, pad tokens segment 2 — the flash kernel's segment masking
(stock splash semantics: only equal ids attend) then isolates pad rows
exactly, so an embedding is invariant to how much padding its batch
row carries (tested). Pooling masks pad rows and mean-pools the rest.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.ops.flash import flash_attention


def _enc_attention(cfg: T.ModelConfig, q, k, v, seg):
    """Bidirectional attention with pad isolation via segment ids."""
    if cfg.attn_impl == "flash":
        return flash_attention(q, k, v, causal=False,
                               segment_ids=(seg, seg))
    # pure-JAX oracle path: explicit pad-column masking (mha_reference
    # has no segment surface; the mask below is the same semantics)
    group = q.shape[1] // k.shape[1]
    kk = jnp.repeat(k, group, axis=1).astype(jnp.float32)
    vv = jnp.repeat(v, group, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kk)
    s = s * (q.shape[-1] ** -0.5)
    same = (seg[:, None, :, None] == seg[:, None, None, :])
    s = jnp.where(same, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vv).astype(q.dtype)


def encode(cfg: T.ModelConfig, params: dict, tokens: jax.Array,
           lengths: Optional[jax.Array] = None):
    """tokens (b, s) int32, lengths (b,) valid prefix lengths (None =
    all-valid) -> (hidden (b, s, d_model), pooled (b, d_model) f32).

    Same blocks as the decoder family (RMSNorm / GQA+RoPE / SwiGLU,
    stacked-layer lax.scan) with causal=False and pad isolation; pooled
    = masked mean over valid positions, the standard embedding head.
    """
    b, s = tokens.shape
    positions = jnp.arange(s, dtype=jnp.int32)
    if lengths is None:
        lengths = jnp.full((b,), s, jnp.int32)
    valid = positions[None, :] < lengths[:, None]            # (b, s)
    seg = jnp.where(valid, 1, 2).astype(jnp.int32)

    x = params["embed"][tokens].astype(cfg.dtype)

    def body(x, layer):
        q, k, v = T.qkv_proj(cfg, layer, x, positions)
        o = _enc_attention(cfg, q, k, v, seg)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.n_q_heads * cfg.d_head)
        x = x + T._proj(o, layer["wo"])
        x = T.mlp_block(cfg, layer, x)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = T.rms_norm(x, params["final_norm"], cfg.rms_eps)

    mask = valid[..., None].astype(jnp.float32)
    pooled = (x.astype(jnp.float32) * mask).sum(axis=1) \
        / jnp.maximum(mask.sum(axis=1), 1.0)
    return x, pooled


def embed_texts(cfg: T.ModelConfig, params: dict, tokens: jax.Array,
                lengths: Optional[jax.Array] = None) -> jax.Array:
    """L2-normalized sentence embeddings (b, d_model) f32 — the
    retrieval-serving surface."""
    _, pooled = encode(cfg, params, tokens, lengths)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-6)
