"""Flagship model: a GQA decoder-only transformer built on the kernel ladder.

The reference is a kernel zoo with no model layer; the north star
(BASELINE.json) turns it into an inference engine, which needs a host model.
This is a llama-family architecture (RMSNorm -> GQA attention with RoPE ->
SwiGLU MLP) written as explicit param pytrees + pure functions — the
idiomatic-JAX shape for sharding with jax.sharding (no framework classes to
fight with PartitionSpecs).

Attention dispatches through the framework's own ladder: `attn_impl` selects
the Pallas flash kernel (default), the pure-JAX oracle (tests), or the
quantized-KV kernels (decode). Weight-only INT8/FP8 projections ride through
ops.quant.quantized_matmul.
"""

from __future__ import annotations

import dataclasses

from typing import Any, Optional

import jax
import jax.numpy as jnp

from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops import quant as Q


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    d_model: int = 1024
    n_layers: int = 8
    n_q_heads: int = 8
    n_kv_heads: int = 2
    d_head: int = 128
    d_ff: int = 2816
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # "flash" (Pallas kernel) | "reference" (pure-JAX oracle)
    attn_impl: str = "flash"
    # optional sliding-window attention (Mistral-style); None = full causal
    attn_window: Any = None

    @property
    def group(self) -> int:
        return self.n_q_heads // self.n_kv_heads


def init_params(cfg: ModelConfig, key: jax.Array) -> dict:
    """He-style init; params stored in cfg.dtype (master weights upcast in
    the optimizer if training)."""
    keys = jax.random.split(key, cfg.n_layers + 2)

    def dense(k, shape, scale_dim):
        return (jax.random.normal(k, shape, jnp.float32)
                / jnp.sqrt(1.0 * scale_dim)).astype(cfg.dtype)

    dm, dh = cfg.d_model, cfg.d_head
    layers = []
    for li in range(cfg.n_layers):
        k = jax.random.split(keys[li], 7)
        layers.append({
            "attn_norm": jnp.ones((dm,), cfg.dtype),
            "wq": dense(k[0], (dm, cfg.n_q_heads * dh), dm),
            "wk": dense(k[1], (dm, cfg.n_kv_heads * dh), dm),
            "wv": dense(k[2], (dm, cfg.n_kv_heads * dh), dm),
            "wo": dense(k[3], (cfg.n_q_heads * dh, dm), cfg.n_q_heads * dh),
            "mlp_norm": jnp.ones((dm,), cfg.dtype),
            "w_gate": dense(k[4], (dm, cfg.d_ff), dm),
            "w_up": dense(k[5], (dm, cfg.d_ff), dm),
            "w_down": dense(k[6], (cfg.d_ff, dm), cfg.d_ff),
        })
    return {
        "embed": dense(keys[-2], (cfg.vocab_size, dm), dm) * jnp.sqrt(1.0 * dm),
        "layers": _stack_layers(layers),
        "final_norm": jnp.ones((dm,), cfg.dtype),
        "lm_head": dense(keys[-1], (dm, cfg.vocab_size), dm),
    }


def _stack_layers(layers):
    """Stacks per-layer dicts into leading-axis arrays for lax.scan."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def quantize_params(params: dict, fmt: str = "int8") -> dict:
    """Weight-only quantization of every projection (embed/norms stay)."""
    out = dict(params)
    qnames = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
    out["layers"] = {
        name: (jax.vmap(lambda w: Q.quantize_weight(w, fmt))(arr)
               if name in qnames else arr)
        for name, arr in params["layers"].items()
    }
    out["lm_head"] = Q.quantize_weight(params["lm_head"], fmt)
    return out


def _proj(x, w):
    if isinstance(w, Q.QuantizedTensor):
        return Q.quantized_matmul(x, w)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def rms_norm(x, gamma, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(
        x.dtype) * gamma


def rope(x, positions, theta):
    """Rotary embedding. x: (b, h, s, d); positions: (b, s) or (s,)."""
    d = x.shape[-1]
    freqs = theta ** (-jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    if positions.ndim == 1:
        positions = positions[None, :]
    angles = positions[:, None, :, None].astype(jnp.float32) * freqs  # b1sf
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


# Pluggable attention overrides (e.g. the shard_map island installed by
# parallel.train.make_train_step under the "island" key).
ATTN_OVERRIDE: dict = {}


def _attention(cfg: ModelConfig, q, k, v, *, causal=True):
    if cfg.attn_impl in ATTN_OVERRIDE and ATTN_OVERRIDE[cfg.attn_impl]:
        # overrides receive the window so a sliding-window model trains
        # with the SAME mask it serves with (train-serve parity)
        return ATTN_OVERRIDE[cfg.attn_impl](q, k, v, causal=causal,
                                            window=cfg.attn_window)
    if cfg.attn_impl == "flash":
        return flash_attention(q, k, v, causal=causal,
                               window=cfg.attn_window)
    assert cfg.attn_window is None, "window needs attn_impl='flash'"
    return R.mha_reference(q, k, v, causal=causal,
                           impl=R.flash_attention_v2_ref).astype(q.dtype)


def qkv_proj(cfg: ModelConfig, layer, x, positions):
    """x (b, s, dm) -> q (b, hq, s, dh), k/v (b, hkv, s, dh) with RoPE."""
    b, s, _ = x.shape
    xn = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
    q = _proj(xn, layer["wq"]).reshape(b, s, cfg.n_q_heads, cfg.d_head)
    k = _proj(xn, layer["wk"]).reshape(b, s, cfg.n_kv_heads, cfg.d_head)
    v = _proj(xn, layer["wv"]).reshape(b, s, cfg.n_kv_heads, cfg.d_head)
    q = rope(q.transpose(0, 2, 1, 3), positions, cfg.rope_theta)
    k = rope(k.transpose(0, 2, 1, 3), positions, cfg.rope_theta)
    return q, k, v.transpose(0, 2, 1, 3)


def attn_block(cfg: ModelConfig, layer, x, positions):
    b, s, _ = x.shape
    q, k, v = qkv_proj(cfg, layer, x, positions)
    o = _attention(cfg, q, k, v, causal=True)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.n_q_heads * cfg.d_head)
    return x + _proj(o, layer["wo"])


def mlp_block(cfg: ModelConfig, layer, x):
    xn = rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
    gate = jax.nn.silu(_proj(xn, layer["w_gate"]).astype(jnp.float32))
    up = _proj(xn, layer["w_up"]).astype(jnp.float32)
    return x + _proj((gate * up).astype(x.dtype), layer["w_down"])


def forward(cfg: ModelConfig, params: dict, tokens: jax.Array,
            positions: Optional[jax.Array] = None) -> jax.Array:
    """Full causal forward: tokens (b, s) int32 -> logits (b, s, vocab) f32.

    Layers run under lax.scan over the stacked-param leading axis (one
    compiled layer body regardless of depth — XLA-friendly control flow).
    """
    b, s = tokens.shape
    if positions is None:
        positions = jnp.arange(s, dtype=jnp.int32)
    x = params["embed"][tokens].astype(cfg.dtype)

    quantized = isinstance(params["layers"]["wq"], Q.QuantizedTensor)

    def body(x, layer):
        x = attn_block(cfg, layer, x, positions)
        x = mlp_block(cfg, layer, x)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = _proj(x, params["lm_head"])
    return logits.astype(jnp.float32)


def loss_fn(cfg: ModelConfig, params: dict, tokens: jax.Array) -> jax.Array:
    """Next-token cross-entropy (mean over positions)."""
    logits = forward(cfg, params, tokens)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)
