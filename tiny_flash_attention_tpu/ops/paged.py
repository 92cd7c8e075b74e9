"""Paged-KV-cache decode attention kernel (bf16 or quantized INT8 pages).

North-star kernel (BASELINE.json config 2): single-token decode against a
block-paged KV cache scattered across HBM. The reference's nearest seed is
the decode-shaped CPU path (c/csrc/attn.cpp:51-53) and its partial-attention
stub (archive attn.cpp:560-604); everything else is TPU-native design:

  * pages live in HBM (`memory_space=ANY`); the kernel gathers the pages of
    the current KV block with one async DMA per page (non-contiguous pages
    cannot be fetched with a strided copy; concurrent DMAs hide the latency)
  * double buffering: while block i computes, block i+1's pages stream into
    the other buffer slot — the cp.async software pipeline of the CUTLASS
    tier (cutlass flash_attention.cu:549-606) rebuilt with Pallas DMA
  * the q-head group of GQA is folded into the q tile (rows = group), so
    each KV page is fetched ONCE per kv head instead of once per q head
  * per-token-row INT8 scales ride along as (1, page_size) lane-oriented
    tiles and fold into the score/p columns exactly as in flash_quant.py
  * `lengths` drives a per-sequence early stop: blocks past the sequence
    length are skipped entirely (compute and DMA)

Grid: (batch, kv_heads, max_blocks) — strictly sequential, one DMA chain.
Scalar-prefetched `lengths` and `page_indices` (PrefetchScalarGridSpec) are
available before the body runs so the gather addresses are known early.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_flash_attention_tpu.ops.quant import QuantizedTensor

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)


def _widen(stat, width):
    """Widen a (rows, 128) running stat to `width` lanes.

    jnp.tile (lane-block replication) when width is lane-aligned; otherwise
    fall back to a broadcastable 1-lane slice (slow cross-lane gather in
    Mosaic, but small widths only hit tiny decode tiles).
    """
    if width % 128 == 0:
        return jnp.tile(stat, (1, width // 128))
    return stat[:, :1]


class _PageGather:
    """One async copy per page of a KV block: HBM pages -> VMEM slot.

    Recreating the descriptor with identical (src, dst, sem) lets the
    consuming grid step wait on DMAs started by the producing step.
    """

    def __init__(self, pages_hbm, vmem_buf, sem, page_indices, seq_offset,
                 block_idx, pages_per_block, head, lane_slice=None):
        self._copies = []
        for p in range(pages_per_block):
            page = page_indices[seq_offset + block_idx * pages_per_block + p]
            if lane_slice is None:
                dst = vmem_buf.at[p]
            else:
                # scales land side-by-side in the lane dim of a (1, bk)
                # buffer, so the kernel needs no sublane->lane shape cast
                dst = vmem_buf.at[:, pl.ds(p * lane_slice, lane_slice)]
            self._copies.append(pltpu.make_async_copy(
                pages_hbm.at[head, page],
                dst,
                sem.at[p],
            ))

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()


def _paged_decode_kernel(
    # scalar prefetch
    lengths_ref, page_indices_ref,
    # inputs
    q_ref, k_pages_hbm, k_scales_hbm, v_pages_hbm, v_scales_hbm,
    # outputs
    o_ref, lse_ref,
    # scratch
    m_scr, l_scr, acc_scr,
    k_buf, k_scale_buf, v_buf, v_scale_buf, k_sems, v_sems, buf_idx,
    *,
    batch: int,
    hkv: int,
    pages_per_block: int,
    pages_per_seq: int,
    page_size: int,
    sm_scale: float,
    quantized: bool,
):
    b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    bk = pages_per_block * page_size
    length = lengths_ref[b]
    n_blocks = pl.cdiv(length, bk)
    max_blocks = pl.num_programs(2)

    def gathers(bb, hh, ii, slot):
        off = bb * pages_per_seq
        gk = _PageGather(k_pages_hbm, k_buf.at[slot], k_sems.at[slot],
                         page_indices_ref, off, ii, pages_per_block, hh)
        gv = _PageGather(v_pages_hbm, v_buf.at[slot], v_sems.at[slot],
                         page_indices_ref, off, ii, pages_per_block, hh)
        extras = []
        if quantized:
            extras.append(_PageGather(
                k_scales_hbm, k_scale_buf.at[slot], k_sems.at[slot + 2],
                page_indices_ref, off, ii, pages_per_block, hh,
                lane_slice=page_size))
            extras.append(_PageGather(
                v_scales_hbm, v_scale_buf.at[slot], v_sems.at[slot + 2],
                page_indices_ref, off, ii, pages_per_block, hh,
                lane_slice=page_size))
        return gk, gv, extras

    def start_all(bb, hh, ii, slot):
        gk, gv, extras = gathers(bb, hh, ii, slot)
        gk.start()
        gv.start()
        for e in extras:
            e.start()

    @pl.when(i * bk < length)
    def _run():
        @pl.when(i == 0)
        def _init_stats():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # First executed cell initializes the buffer index and starts its own
        # gather (no predecessor has prefetched for it).
        @pl.when((b == 0) & (h == 0) & (i == 0))
        def _bootstrap():
            buf_idx[0] = 0
            start_all(b, h, i, 0)

        slot = buf_idx[0]

        # Next executing grid cell (walk i, then h, then b; lengths >= 1).
        nxt_in_seq = i + 1 < n_blocks
        nb = jnp.where(nxt_in_seq, b, jnp.where(h + 1 < hkv, b, b + 1))
        nh = jnp.where(nxt_in_seq, h, jnp.where(h + 1 < hkv, h + 1, 0))
        ni = jnp.where(nxt_in_seq, i + 1, 0)

        @pl.when(nb < batch)
        def _prefetch_next():
            start_all(nb, nh, ni, 1 - slot)

        buf_idx[0] = 1 - slot

        # Wait for this block's pages and compute.
        gk, gv, extras = gathers(b, h, i, slot)
        gk.wait()
        # sm_scale*log2(e) folded into the tiny (G, d) q tile: softmax runs
        # on raw exp2 in the log2 domain (kscale is a linear factor and
        # commutes); stats widen via jnp.tile of the 128-lane scratch, never
        # a 1-lane slice broadcast (Mosaic cross-lane gather).
        q = q_ref[0, 0]                               # (G, d)
        q = (q * jnp.asarray(sm_scale * _LOG2E, q.dtype)).astype(q.dtype)
        k = k_buf[slot].reshape(bk, -1).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (G, bk)
        if quantized:
            extras[0].wait()
            kscale = k_scale_buf[slot]          # (1, bk), lane-oriented
            s *= kscale

        col = i * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < length, s, DEFAULT_MASK_VALUE)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - _widen(m_next, bk))
        # empty-row guard (rows of a padded GQA group)
        p *= _widen(m_next > 0.5 * DEFAULT_MASK_VALUE, bk)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...], l_scr[...] = m_next, l_next

        gv.wait()
        v = v_buf[slot].reshape(bk, -1).astype(q_ref.dtype)
        if quantized:
            extras[1].wait()
            vscale = v_scale_buf[slot]          # (1, bk)
            p = p * vscale
        d_acc = acc_scr.shape[-1]
        acc_scr[...] = acc_scr[...] * _widen(alpha, d_acc) + \
            jax.lax.dot_general(
                p.astype(q_ref.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(i == n_blocks - 1)
        def _epilogue():
            l = l_scr[...]
            l_safe = jnp.where((l == 0.0) | jnp.isnan(l), 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / _widen(l_safe, d_acc)).astype(
                o_ref.dtype)
            lse_ref[0, 0] = (m_scr[:, :1] * _LN2 +
                             jnp.log(l_safe[:, :1])).astype(lse_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "pages_per_block", "interpret"))
def paged_decode_attention(
    q: jax.Array,
    k_pages,
    v_pages,
    lengths: jax.Array,
    page_indices: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    pages_per_block: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Single-token decode attention over a paged KV cache.

    Args:
      q: (batch, q_heads, head_dim) — the current token's queries.
      k_pages, v_pages: (kv_heads, num_pages, page_size, head_dim) arrays, or
        QuantizedTensor with int8 values of that shape and scales
        (kv_heads, num_pages, page_size, 1).
      lengths: (batch,) int32 — tokens in each sequence (>= 1).
      page_indices: (batch, pages_per_seq) int32 — page table; entries beyond
        a sequence's pages may be anything in range (arbitrary but valid).
      pages_per_block: KV pages gathered and processed per kernel step.

    Returns: out (batch, q_heads, head_dim), lse (batch, q_heads).
    """
    quantized = isinstance(k_pages, QuantizedTensor)
    if quantized:
        # fp32 scale pages are DMA'd as (1, page_size) lane rows; HBM memref
        # slicing requires 128-lane alignment, hence the page_size constraint
        # for quantized caches (bf16 caches may use smaller pages).
        assert k_pages.values.shape[2] % 128 == 0, (
            "quantized paged KV needs page_size % 128 == 0, got "
            f"{k_pages.values.shape[2]}")
        k_scales = jnp.swapaxes(k_pages.scales, 2, 3)  # (hkv, np, 1, ps)
        v_scales = jnp.swapaxes(v_pages.scales, 2, 3)
        k_pages, v_pages = k_pages.values, v_pages.values
    else:
        # tiny placeholder so the arg list is static
        k_scales = jnp.zeros((1, 1, 1, 1), jnp.float32)
        v_scales = jnp.zeros((1, 1, 1, 1), jnp.float32)

    batch, hq, d = q.shape
    hkv, num_pages, page_size, _ = k_pages.shape
    assert hq % hkv == 0
    group = hq // hkv
    pages_per_seq = page_indices.shape[1]
    if pages_per_block is None:
        # tuned on v5e (see ops/paged_fused.py): ~16 pages/block for bf16,
        # ~32 for int8 — the largest divisor of pages_per_seq within the cap
        cap = max(1, (32 if quantized else 16) * 128 // max(page_size, 1))
        pages_per_block = max(
            p for p in range(1, pages_per_seq + 1)
            if pages_per_seq % p == 0 and p <= cap)
    assert pages_per_seq % pages_per_block == 0, (
        pages_per_seq, pages_per_block)
    max_blocks = pages_per_seq // pages_per_block
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Fold the GQA group into the q tile: (batch, hkv, G, d), G padded to the
    # fp32 sublane quantum so the (G, bk) score tile is well-formed.
    g_pad = max(8, _round_up(group, 8))
    qg = q.reshape(batch, hkv, group, d)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    kernel = functools.partial(
        _paged_decode_kernel,
        batch=batch, hkv=hkv, pages_per_block=pages_per_block,
        pages_per_seq=pages_per_seq, page_size=page_size,
        sm_scale=sm_scale, quantized=quantized)

    sdtype = k_scales.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, hkv, max_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, g_pad, d), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # k pages stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # k scales
            pl.BlockSpec(memory_space=pl.ANY),   # v pages
            pl.BlockSpec(memory_space=pl.ANY),   # v scales
        ],
        out_specs=[
            pl.BlockSpec((1, 1, g_pad, d), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, g_pad, 1), lambda b, h, i, *_: (b, h, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, d), jnp.float32),
            pltpu.VMEM((2, pages_per_block, page_size, d), k_pages.dtype),
            pltpu.VMEM((2, 1, pages_per_block * page_size), sdtype),
            pltpu.VMEM((2, pages_per_block, page_size, d), v_pages.dtype),
            pltpu.VMEM((2, 1, pages_per_block * page_size), sdtype),
            pltpu.SemaphoreType.DMA((4, pages_per_block)),
            pltpu.SemaphoreType.DMA((4, pages_per_block)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, hkv, g_pad, d), q.dtype),
            jax.ShapeDtypeStruct((batch, hkv, g_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(lengths, page_indices.reshape(-1), qg, k_pages, k_scales, v_pages,
      v_scales)

    out = out[:, :, :group, :].reshape(batch, hq, d)
    lse = lse[:, :, :group, 0].reshape(batch, hq)
    return out, lse


def _round_up(x, m):
    return ((x + m - 1) // m) * m
