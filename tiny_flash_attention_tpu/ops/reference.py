"""Pure-JAX attention algorithm ladder — the oracle layer.

TPU-native re-design of the reference's pedagogical Python tier
(flash_attention_py/tiny_flash_attn.py:4-202, main.py:8-54,
main_torch_only.py:9-270). Instead of Python loops mutating "HBM buffers",
the streaming variants are written as `lax.scan`s carrying the online-softmax
state `(m, l, acc)` — the functional, compiler-friendly equivalent — and
multi-head batching is `vmap`, not hand-written 4-D indexing.

Capability parity (SURVEY.md section 7):
  * naive / safe / online softmax variants (ref main.py:8-54 class ladder)
  * FA1 (KV-outer) and FA2 (Q-outer) loop orders
    (ref tiny_flash_attn.py:4-79 vs :81-135)
  * causal masking incl. q_len != kv_len decode shapes
    (ref flash_attention_c/csrc/attn.cpp:51-53, main_torch_only.py:119-125)
  * softmax_scale (ref main_torch_only.py:45-157)
  * fp32 accumulation regardless of input dtype
    (ref cutlass kernel_traits.h:22 ElementAccum=float)
  * log-sum-exp (LSE) output for a backward pass
    (ref tiny_flash_attn_triton.py:195-197, cutlass flash_attention.cu:756-759)
  * GQA via head-group indexing (ref archive attn.cpp:29,61,140,212,375)

Everything here runs on CPU and TPU; it is the ground truth every Pallas
kernel and the C++ oracle are tested against (SURVEY.md section 4 ladder).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _causal_mask(q_len: int, kv_len: int, dtype=jnp.float32) -> jax.Array:
    """Causal mask supporting decode-shaped q_len != kv_len.

    Row i of Q sits at absolute position ``i + (kv_len - q_len)``; it may
    attend to KV positions <= that (ref flash_attention_c/csrc/attn.cpp:51-53
    `kv_len = i + 1 + (k_seqlen - q_seqlen)`).
    """
    offset = kv_len - q_len
    rows = jnp.arange(q_len)[:, None] + offset
    cols = jnp.arange(kv_len)[None, :]
    return cols <= rows


def _apply_mask(s: jax.Array, causal: bool, q_len: int, kv_len: int) -> jax.Array:
    if not causal:
        return s
    return jnp.where(_causal_mask(q_len, kv_len), s, DEFAULT_MASK_VALUE)


def attention_naive(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Naive softmax attention: materializes the full (q_len, kv_len) scores.

    The oracle against which everything is checked (ref main.py:13-24
    NativeAttention, cutlass/test.py:19-27). Single head: q (q_len, d),
    k/v (kv_len, d). Accumulates in fp32.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("qd,kd->qk", q, k, preferred_element_type=jnp.float32)
    s = _apply_mask(s * sm_scale, causal, q.shape[0], k.shape[0])
    p = jax.nn.softmax(s, axis=-1)
    # Fully-masked rows (possible when causal and q_len > kv_len) output 0,
    # matching the kernels' empty-row guard (ref cutlass :620).
    if causal and q.shape[0] > k.shape[0]:
        valid_row = jnp.any(_causal_mask(q.shape[0], k.shape[0]), axis=-1,
                            keepdims=True)
        p = jnp.where(valid_row, p, 0.0)
    return jnp.einsum("qk,kd->qd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attention_safe(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Max-subtracted "safe" softmax attention (ref main.py:27-39
    SafeAttention; main_torch_only.py:9-43 safe_self_attention)."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("qd,kd->qk", q, k, preferred_element_type=jnp.float32)
    s = _apply_mask(s * sm_scale, causal, q.shape[0], k.shape[0])
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m) * (m > 0.5 * DEFAULT_MASK_VALUE)
    d = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(d == 0.0, 1.0, d)
    return jnp.einsum("qk,kd->qd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attention_online(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_kv: int = 128,
) -> jax.Array:
    """One-pass online-softmax attention, whole Q at once, streaming KV.

    The OnlineSafeAttention rung of the ladder (ref main.py:42-54) written as
    a `lax.scan` over KV blocks carrying (m, l, acc) — the 1-pass recurrence
    d'_i = d'_{i-1} e^{m_{i-1}-m_i} + e^{x_i-m_i} (README_zh.md derivation).
    """
    return flash_attention_v2_ref(
        q, k, v, causal=causal, sm_scale=sm_scale,
        block_q=q.shape[0], block_kv=block_kv,
    )


def flash_attention_v1_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 128,
    block_kv: int = 128,
) -> jax.Array:
    """FA1 loop order: KV-outer, Q-inner, with O/m/l re-read every KV step.

    Functional re-design of ref tiny_flash_attn.py:4-79 (and the CUDA
    gMax/gDenom-in-global-memory variant, cuda flash_attention.cu:158-315):
    the outer `lax.scan` is over KV blocks; the carried state is the full
    per-row (m, l, o) "HBM buffers". Kept for parity/teaching — FA2 below is
    the production loop order.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    q_len, d = q.shape
    kv_len = k.shape[0]
    n_kv = _ceil_div(kv_len, block_kv)
    k_pad, v_pad, kv_valid = _pad_kv(k, v, n_kv * block_kv)

    qf = q.astype(jnp.float32) * sm_scale
    kb = k_pad.astype(jnp.float32).reshape(n_kv, block_kv, d)
    vb = v_pad.astype(jnp.float32).reshape(n_kv, block_kv, d)

    def kv_step(carry, inputs):
        m_prev, l_prev, o_prev = carry
        kj, vj, j = inputs
        s = qf @ kj.T  # (q_len, block_kv)
        cols = j * block_kv + jnp.arange(block_kv)[None, :]
        valid = cols < kv_len
        if causal:
            rows = jnp.arange(q_len)[:, None] + (kv_len - q_len)
            valid = valid & (cols <= rows)
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # Row-empty guard: if nothing valid has been seen yet (m still at the
        # mask floor), contribute nothing instead of exp(0)=1 per column.
        p = jnp.exp(s - m_new) * (m_new > 0.5 * DEFAULT_MASK_VALUE)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        # FA1 rescales O by l on every step (the "drawback" the reference
        # calls out at cuda flash_attention.cu:224-229): o holds the final
        # normalized output after each iteration.
        l_safe = jnp.where(l_new == 0.0, 1.0, l_new)
        o_new = (l_prev * alpha * o_prev + p @ vj) / l_safe
        return (m_new, l_new, o_new), None

    m0 = jnp.full((q_len, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((q_len, 1), jnp.float32)
    o0 = jnp.zeros((q_len, d), jnp.float32)
    (m, l, o), _ = jax.lax.scan(
        kv_step, (m0, l0, o0), (kb, vb, jnp.arange(n_kv)))
    return o.astype(q.dtype)


def flash_attention_v2_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 128,
    block_kv: int = 128,
    return_lse: bool = False,
):
    """FA2 loop order: Q-outer, KV-inner, single normalization epilogue.

    Re-design of ref tiny_flash_attn.py:81-135 / flash_attn_v2_multihead
    :137-196: per Q block, a `lax.scan` over KV blocks carries unnormalized
    (m, l, acc) in fp32 "SRAM locals"; the single `acc / l` division happens
    once in the epilogue (ref :131). Also returns LSE = m + log(l) when asked
    (ref triton :195-197 stores L = m + log2(d) base-2; we use natural log).

    Shapes: q (q_len, d); k, v (kv_len, d). Works for q_len != kv_len
    (decode shape) and non-divisible lengths via padding + masking.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    q_len, d = q.shape
    kv_len = k.shape[0]
    block_q = min(block_q, max(q_len, 1))
    n_q = _ceil_div(q_len, block_q)
    n_kv = _ceil_div(kv_len, block_kv)
    q_pad = _pad_rows(q, n_q * block_q).astype(jnp.float32) * sm_scale
    k_pad, v_pad, _ = _pad_kv(k, v, n_kv * block_kv)
    qb = q_pad.reshape(n_q, block_q, d)
    kb = k_pad.astype(jnp.float32).reshape(n_kv, block_kv, d)
    vb = v_pad.astype(jnp.float32).reshape(n_kv, block_kv, d)

    def q_block(qi, i):
        def kv_step(carry, inputs):
            m_prev, l_prev, acc = carry
            kj, vj, j = inputs
            s = qi @ kj.T
            rows = i * block_q + jnp.arange(block_q)[:, None] + (kv_len - q_len)
            cols = j * block_kv + jnp.arange(block_kv)[None, :]
            valid = cols < kv_len
            if causal:
                valid = valid & (cols <= rows)
            s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new) * (m_new > 0.5 * DEFAULT_MASK_VALUE)
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = alpha * acc + p @ vj
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        a0 = jnp.zeros((block_q, d), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(
            kv_step, (m0, l0, a0), (kb, vb, jnp.arange(n_kv)))
        # Epilogue: single division; empty-row guard mirrors the cutlass
        # `sum == 0.f || sum != sum` handling (flash_attention.cu:620).
        l_safe = jnp.where((l == 0.0) | jnp.isnan(l), 1.0, l)
        o = acc / l_safe
        lse = m.squeeze(-1) + jnp.log(l_safe.squeeze(-1))
        return o, lse

    o, lse = jax.vmap(q_block)(qb, jnp.arange(n_q))
    o = o.reshape(n_q * block_q, d)[:q_len].astype(q.dtype)
    lse = lse.reshape(n_q * block_q)[:q_len]
    if return_lse:
        return o, lse
    return o


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    impl=attention_naive,
    return_lse: bool = False,
    **impl_kwargs,
):
    """Batched multi-head (and GQA) attention over (batch, heads, seq, d).

    The reference batches by hand-indexing 4-D tensors
    (tiny_flash_attn.py:137-196) and grid dims (triton :25); here it is two
    nested `vmap`s. GQA: num_q_heads must be a multiple of num_kv_heads; each
    group of q heads attends to its shared kv head (ref archive
    attn.cpp:29,61 `gqa_group_size = head / k_head`).
    """
    bs, hq, q_len, d = q.shape
    hkv = k.shape[1]
    assert hq % hkv == 0, f"q heads {hq} not a multiple of kv heads {hkv}"
    group = hq // hkv
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    fn = functools.partial(impl, causal=causal, sm_scale=sm_scale, **impl_kwargs)
    if return_lse:
        fn = functools.partial(fn, return_lse=True)
    out = jax.vmap(jax.vmap(fn))(q, k, v)
    return out


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _pad_rows(x: jax.Array, to: int) -> jax.Array:
    if x.shape[0] == to:
        return x
    return jnp.pad(x, ((0, to - x.shape[0]), (0, 0)))


def _pad_kv(k: jax.Array, v: jax.Array, to: int):
    kv_len = k.shape[0]
    return _pad_rows(k, to), _pad_rows(v, to), kv_len
