"""Flash attention over a quantized (INT8 / FP8-e4m3) KV cache.

North-star kernel (BASELINE.json configs 2-3): same online-softmax pipeline
as ops/flash.py, but K/V arrive as low-bit payloads with per-token-row fp32
scales and the dequant is folded *around* the matmuls inside the streaming
loop — never materializing a dequantized cache in HBM:

    s = (q @ k_int^T) * k_scale^T          (scale applied to score columns)
    o += (p * v_scale^T) @ v_int           (scale applied to p columns)

The payload convert int8->bf16 happens on the VPU per VMEM tile (the analog
of the reference archive's per-thread fp32 cast buffers, archive
attn.cpp:250-351); HBM traffic for the cache is halved (int8) vs bf16.
Scales are stored pre-transposed (b, h_kv, 1, s) so their tiles are
lane-oriented and the column-wise multiplies need no relayout.
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
from tiny_flash_attention_tpu.ops.quant import QuantizedTensor

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)


def _payload_to_compute(x, dtype):
    """Converts a quantized payload tile to the compute dtype.

    fp8-e4m3 -> bf16 is rebuilt with integer bit surgery (sign<<8, mantissa
    <<4, exponent rebias +120) instead of the generic float convert, which
    lowers much wider on the VPU. Zero is special-cased exactly; fp8
    denormals land slightly high (< 2^-6 * 40%), far below the fp8
    quantization noise itself. Other payloads use the native convert.
    """
    if x.dtype == jnp.float8_e4m3fn and dtype == jnp.bfloat16:
        u = pltpu.bitcast(x, jnp.int8).astype(jnp.int32)
        sign = (u & 0x80) << 8
        mag = u & 0x7F
        bits = jnp.where(mag == 0, sign, sign | ((mag << 4) + (120 << 7)))
        return pltpu.bitcast(bits.astype(jnp.int16), jnp.bfloat16)
    return x.astype(dtype)


def _fwd_quant_kernel(
    q_ref, k_ref, v_ref, kscale_ref, vscale_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *,
    causal: bool,
    sm_scale: float,
    n_kv: int,
    block_q: int,
    block_kv: int,
    group: int,
    q_len: int,
    kv_len: int,
    kv_pad: bool,
    kv_splits: int,
):
    qi = pl.program_id(2)
    kvi = pl.program_id(3)
    offset = kv_len - q_len
    rows = group * block_q

    @pl.when(kvi == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = (kvi * block_kv <= (qi + 1) * block_q - 1 + offset
                  if causal else True)

    @pl.when(should_run)
    def _step():
        # sm_scale*log2(e) folds into the q tile (cheap side of the dot);
        # the k dequant scale is a linear factor so it commutes with the
        # log2-domain trick: exp2((qk*sm_scale*log2e)*kscale) ==
        # exp(qk*sm_scale*kscale). All stats below are log2-domain. The GQA
        # group's q heads are folded into the tile rows so each quantized
        # K/V tile is DMA'd once per KV head (see ops/flash.py). kv_splits
        # sub-tiles the block so the next sub-tile's dequant+QK overlaps
        # the previous sub-tile's softmax on the VPU.
        q = q_ref[0].reshape(rows, q_ref.shape[-1])
        q = (q * jnp.asarray(sm_scale * _LOG2E, q.dtype)).astype(q.dtype)
        d_rep = acc_scr.shape[-1] // LANES
        sub = block_kv // kv_splits
        for si in range(kv_splits):
            col0 = kvi * block_kv + si * sub
            k = _payload_to_compute(k_ref[0, 0, si * sub:(si + 1) * sub],
                                    q_ref.dtype)
            kscale = kscale_ref[0, 0, :, si * sub:(si + 1) * sub]  # (1, sub)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s *= kscale                           # fold dequant

            need_col_mask = kv_pad or causal
            if need_col_mask:
                ci = jax.lax.broadcasted_iota(jnp.int32, (rows, sub), 1)
                mask = None
                if causal:
                    # folded row r sits at position qi*block_q+(r % block_q)
                    r = jax.lax.broadcasted_iota(jnp.int32, (rows, sub), 0)
                    mask = (ci - (r % block_q)) <= (
                        qi * block_q + offset - col0)
                if kv_pad:
                    col_ok = col0 + ci < kv_len
                    mask = col_ok if mask is None else (mask & col_ok)
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            # stats stay 128 lanes wide; widen with jnp.tile, never a
            # 1-lane slice broadcast (Mosaic cross-lane gather, ~2x step)
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            kv_rep = sub // LANES
            p = jnp.exp2(s - jnp.tile(m_next, (1, kv_rep)))
            if causal and kv_len < q_len:
                # empty-row guard for q_len > kv_len decode shapes (rows
                # before the first kv position see only the mask floor)
                p *= jnp.tile(m_next > 0.5 * DEFAULT_MASK_VALUE,
                              (1, kv_rep))
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_next
            l_scr[...] = l_next

            v = _payload_to_compute(v_ref[0, 0, si * sub:(si + 1) * sub],
                                    q_ref.dtype)
            vscale = vscale_ref[0, 0, :, si * sub:(si + 1) * sub]
            p_scaled = (p * vscale).astype(q_ref.dtype)
            acc_scr[...] = acc_scr[...] * jnp.tile(alpha, (1, d_rep)) + \
                jax.lax.dot_general(
                    p_scaled, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    @pl.when(kvi == n_kv - 1)
    def _epilogue():
        l = l_scr[...]
        l_safe = jnp.where((l == 0.0) | jnp.isnan(l), 1.0, l)
        o_ref[0] = (acc_scr[...] / jnp.tile(
            l_safe, (1, acc_scr.shape[-1] // LANES))).astype(
                o_ref.dtype).reshape(o_ref.shape[1:])
        lse_ref[0] = (m_scr[:, :1] * _LN2 + jnp.log(l_safe[:, :1])).astype(
            lse_ref.dtype).reshape(lse_ref.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "config", "return_lse"))
def flash_attention_quantized(
    q: jax.Array,
    k: QuantizedTensor,
    v: QuantizedTensor,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    config: Optional[FlashConfig] = None,
    return_lse: bool = False,
):
    """Flash attention with an INT8/FP8 KV cache (per-token-row scales).

    q: (b, hq, q_len, d) bf16/fp32. k, v: QuantizedTensor with values
    (b, hkv, kv_len, d) int8 or float8_e4m3fn and scales (b, hkv, kv_len, 1).
    """
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, _ = k.values.shape
    assert hq % hkv == 0
    group = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if config is None:
        config = default_config(q.dtype, d, q_len, kv_len,
                                interpret=jax.default_backend() != "tpu")
        if k.values.dtype == jnp.float8_e4m3fn and config.kv_splits > 1:
            # measured on v5e: sub-tiling helps int8 (+2.5%) but hurts fp8
            # (-3%) — the bit-surgery convert already fills the VPU slots
            import dataclasses as _dc
            config = _dc.replace(config, kv_splits=1)
    # Folded q tile: the configured block_q is the total row budget.
    block_q = max(LANES, _round_up(config.block_q // group, LANES))
    block_q = min(block_q, _round_up(q_len, LANES))
    block_kv = min(config.block_kv, _round_up(kv_len, LANES))
    rows = group * block_q

    d_pad = _round_up(d, LANES)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_kv)
    n_q, n_kv = q_pad // block_q, kv_pad // block_kv

    qp = _pad4(q, q_pad, d_pad)
    kp = _pad4(k.values, kv_pad, d_pad)
    vp = _pad4(v.values, kv_pad, d_pad)
    # scales transposed to (b, hkv, 1, s_pad): lane-oriented tiles
    ks = _pad_lane(jnp.swapaxes(k.scales, 2, 3), kv_pad)
    vs = _pad_lane(jnp.swapaxes(v.scales, 2, 3), kv_pad)

    kv_splits = config.kv_splits
    while block_kv % (kv_splits * LANES) and kv_splits > 1:
        kv_splits //= 2
    kernel = functools.partial(
        _fwd_quant_kernel, causal=causal, sm_scale=sm_scale, n_kv=n_kv,
        block_q=block_q, block_kv=block_kv, group=group, q_len=q_len,
        kv_len=kv_len, kv_pad=kv_pad != kv_len, kv_splits=kv_splits)

    out, lse = pl.pallas_call(
        kernel,
        grid=(bs, hkv, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, group, block_q, d_pad),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, 1, block_kv),
                         lambda b, h, i, j: (b, h, 0, j)),
            pl.BlockSpec((1, 1, 1, block_kv),
                         lambda b, h, i, j: (b, h, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, group, block_q, d_pad),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, group, block_q, 1),
                         lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, hq, q_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, hq, q_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=config.interpret,
    )(qp, kp, vp, ks, vs)

    out = out[:, :, :q_len, :d]
    if return_lse:
        return out, lse[:, :, :q_len, 0]
    return out


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pad4(x, s_to, d_to):
    ps, pd = s_to - x.shape[2], d_to - x.shape[3]
    if ps == 0 and pd == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, ps), (0, pd)))


def _pad_lane(x, s_to):
    ps = s_to - x.shape[3]
    if ps == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, ps)))
