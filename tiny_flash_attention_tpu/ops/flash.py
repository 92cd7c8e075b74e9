"""Pallas flash-attention-2 forward kernel family — the flagship device tier.

Brand-new TPU design of the capability the reference implements three times
(triton flash_attention_py/tiny_flash_attn_triton.py:49-207; raw CUDA
flash_attention_cuda/csrc/flash_attention.cu:16-156; CUTLASS/CuTe
flash_attention_cutlass/csrc/flash_attention.cu:373-685). Nothing is
translated: where the CUDA tiers hand-build smem tiles, cp.async pipelines and
warp shuffles, here the HBM->VMEM tile pipeline is expressed with BlockSpecs
(Pallas/Mosaic inserts the double-buffered DMAs), the MXU runs both matmuls
via `jax.lax.dot_general` with fp32 accumulation, and the online-softmax state
(m, l, acc) lives in VMEM scratch that persists across the KV grid dimension.

Decomposition (same math, TPU-shaped):
  grid = (batch, q_heads, q_len/block_q, kv_len/block_kv)
         -- the first three dims are "parallel" (megacore-splittable), the KV
            dim is "arbitrary": it is the online-softmax reduction, the analog
            of the CUDA kernels' inner nbi loop (cutlass :549-606).
  per step: s = q @ k^T (MXU, f32 acc) -> causal/length mask -> running
            max/sum rescale (VPU, f32) -> p @ v accumulate (MXU).
  epilogue on the last KV step: acc / l, LSE = m + log(l)
            (ref cutlass :617-630, triton :191-197).

Causal handling is two-level exactly like the reference: whole KV tiles above
the diagonal are skipped (`pl.when`; ref block-range clamp cutlass :536-540)
and the diagonal tile is masked elementwise with broadcasted iotas (ref
per-element `tl.where`, triton :151-152). Decode-shaped q_len != kv_len is
supported through the row-position offset (ref c/csrc/attn.cpp:51-53). GQA
maps each q head to its kv group purely in the K/V BlockSpec index maps (ref
archive attn.cpp:140 head_group_id) — zero data movement.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_flash_attention_tpu.ops.configs import FlashConfig, default_config, LANES

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _fwd_kernel(
    q_ref, k_ref, v_ref,          # inputs (VMEM tiles)
    o_ref, lse_ref,               # outputs
    m_scr, l_scr, acc_scr,        # VMEM scratch, persistent over the KV dim
    *,
    causal: bool,
    sm_scale: float,
    n_kv: int,
    block_q: int,
    block_kv: int,
    q_len: int,
    kv_len: int,
    kv_pad: bool,
):
    qi = pl.program_id(2)
    kvi = pl.program_id(3)
    offset = kv_len - q_len  # decode-shape row offset

    @pl.when(kvi == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        # Tile-level skip: the tile's first KV column must not exceed the
        # last Q row's absolute position (ref cutlass n_block_max clamp
        # :536-540 / triton loop bound hi :140).
        should_run = kvi * block_kv <= (qi + 1) * block_q - 1 + offset
    else:
        should_run = True

    # fp32 inputs must not silently run through bf16 MXU passes (the TPU
    # default); bf16 inputs already accumulate in fp32 via
    # preferred_element_type so default precision is exact for them.
    precision = (jax.lax.Precision.HIGHEST
                 if q_ref.dtype == jnp.float32 else None)

    @pl.when(should_run)
    def _step():
        q = q_ref[0, 0]  # (block_q, d)
        k = k_ref[0, 0]  # (block_kv, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (block_q, block_kv)
        s *= sm_scale

        need_col_mask = kv_pad or causal
        if need_col_mask:
            col = kvi * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            mask = col < kv_len if kv_pad else None
            if causal:
                row = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 0) + offset
                cmask = col <= row
                mask = cmask if mask is None else (mask & cmask)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]                         # (block_q, LANES)
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)   # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_cur)         # lanes all equal
        alpha = jnp.exp(m_prev - m_next)            # correction for old stats
        p = jnp.exp(s - m_next[:, :1])
        if need_col_mask:
            # Fully-masked-tile guard: while m is still at the mask floor
            # (nothing valid seen), exp(s - m) would be 1 per masked column;
            # zero the contribution instead (ref cutlass :620 empty-row case).
            p *= m_next[:, :1] > 0.5 * DEFAULT_MASK_VALUE
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]  # (block_kv, d)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(kvi == n_kv - 1)
    def _epilogue():
        l = l_scr[:, :1]
        # Empty/NaN row guard (ref cutlass :620 `sum == 0.f || sum != sum`).
        l_safe = jnp.where((l == 0.0) | jnp.isnan(l), 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        # LSE stays sublane-oriented (block_q, 1): no transpose, no padding.
        lse_ref[0, 0] = (m_scr[:, :1] + jnp.log(l_safe)).astype(lse_ref.dtype)


def _flash_fwd_impl(q, k, v, causal, sm_scale, config):
    """Runs the forward pallas_call; returns (out, lse)."""
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, dk = k.shape
    assert dk == d and v.shape == k.shape, (q.shape, k.shape, v.shape)
    group = hq // hkv
    block_q, block_kv = config.block_q, config.block_kv

    # Pad to tile multiples. Zero-padded head_dim columns are exact (they add
    # zero to every dot product); padded Q rows are sliced off; padded KV rows
    # are masked with DEFAULT_MASK_VALUE inside the kernel.
    d_pad = _round_up(d, LANES)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_kv)
    q = _pad(q, (0, 0, q_pad - q_len, d_pad - d))
    k = _pad(k, (0, 0, kv_pad - kv_len, d_pad - d))
    v = _pad(v, (0, 0, kv_pad - kv_len, d_pad - d))
    n_q, n_kv = q_pad // block_q, kv_pad // block_kv

    kernel = functools.partial(
        _fwd_kernel,
        causal=causal,
        sm_scale=sm_scale,
        n_kv=n_kv,
        block_q=block_q,
        block_kv=block_kv,
        q_len=q_len,
        kv_len=kv_len,
        kv_pad=kv_pad != kv_len,
    )

    compiler_params = None
    if config.use_dimension_semantics:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        )

    flops_mask = 0.5 if causal else 1.0
    cost = pl.CostEstimate(
        flops=int(4 * bs * hq * q_len * kv_len * d * flops_mask),
        bytes_accessed=int(
            q.size * q.dtype.itemsize
            + (k.size + v.size) * k.dtype.itemsize * (hq // hkv)
            + q.size * q.dtype.itemsize),
        transcendentals=int(bs * hq * q_len * kv_len * flops_mask),
    )

    out, lse = pl.pallas_call(
        kernel,
        grid=(bs, hq, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, i, j, g=group: (b, h // g, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, i, j, g=group: (b, h // g, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, hq, q_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, hq, q_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),   # running max m
            pltpu.VMEM((block_q, LANES), jnp.float32),   # running sum l
            pltpu.VMEM((block_q, d_pad), jnp.float32),   # output accumulator
        ],
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=config.interpret,
    )(q, k, v)

    return out[:, :, :q_len, :d], lse[:, :, :q_len, 0]


# --- custom VJP wiring -------------------------------------------------------
# The reference emits the LSE "for a (never-implemented) backward"
# (SURVEY.md section 5 checkpoint row); here the backward exists: Pallas dq +
# dkv kernels in flash_bwd.py, attached via custom_vjp so the flagship kernel
# is trainable end-to-end.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, causal, sm_scale, config):
    out, _ = _flash_fwd_impl(q, k, v, causal, sm_scale, config)
    return out


def _flash_fwd_rule(q, k, v, causal, sm_scale, config):
    out, lse = _flash_fwd_impl(q, k, v, causal, sm_scale, config)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(causal, sm_scale, config, res, g):
    from tiny_flash_attention_tpu.ops.flash_bwd import flash_attention_bwd
    q, k, v, out, lse = res
    bwd_block = min(128, config.block_q, config.block_kv)
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, lse, g, causal=causal, sm_scale=sm_scale,
        block_q=bwd_block, block_kv=bwd_block, interpret=config.interpret)
    return dq, dk, dv


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "config", "return_lse"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    config: Optional[FlashConfig] = None,
    return_lse: bool = False,
):
    """Flash-attention-2 forward (differentiable).

    Args:
      q: (batch, q_heads, q_len, head_dim)
      k, v: (batch, kv_heads, kv_len, head_dim); q_heads % kv_heads == 0 (GQA)
      causal: two-level causal masking incl. decode shapes (q_len != kv_len)
      sm_scale: softmax scale, default 1/sqrt(head_dim)
      config: tile geometry; defaults via the (dtype, head_dim) dispatch table
      return_lse: also return log-sum-exp (batch, q_heads, q_len) float32
        (ref cutlass flash_attention.cu:756-771 returns {out, softmax_lse})

    Returns: out (same shape/dtype as q), and lse if requested.
    """
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, _ = k.shape
    assert hq % hkv == 0, f"GQA needs q_heads {hq} % kv_heads {hkv} == 0"
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if config is None:
        # Interpret mode on non-TPU backends: the CPU-runnable "standalone"
        # equivalent (SURVEY.md section 4 implication).
        config = default_config(q.dtype, d, q_len, kv_len,
                                interpret=jax.default_backend() != "tpu")
    if return_lse:
        return _flash_fwd_impl(q, k, v, causal, sm_scale, config)
    return _flash(q, k, v, causal, sm_scale, config)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad(x: jax.Array, pad_last2):
    p2, p3 = pad_last2[2], pad_last2[3]
    if p2 == 0 and p3 == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, p2), (0, p3)))
