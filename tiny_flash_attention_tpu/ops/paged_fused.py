"""Fused-page decode attention: one DMA per page (K+V payload + scales).

The DMA-economics successor to ops/paged.py: at decode block sizes the paged
kernel is DMA-*issue*-bound, not bandwidth-bound (measured ~180 ns per issued
copy on v5e through this host), so the page format is designed to minimize
copies: each page packs, in one contiguous int8/bf16 block,

    rows [0, ps)          K payload (ps tokens x d)
    rows [ps, 2ps)        V payload
    rows [2ps, 2ps+4)     K per-token scales, f32 bit-packed into int8 rows
    rows [2ps+4, 2ps+8)   V per-token scales            (int8 format only)

One `make_async_copy` per page fetches everything — 4x fewer DMAs than
separate K/V/scale arrays. Scale rows are unpacked in-register with
`pltpu.bitcast((4, d) int8 -> (1, d) f32)`; the byte-j-of-token-i-at-row-j
layout is produced by `pack_kv_page` below and verified on hardware.

Kernel structure (grid, double buffering, online softmax) matches
ops/paged.py; see its docstring for the design citations. Scales fold into
per-page K dots / V accumulates, so no sublane->lane scale reassembly exists
anywhere.

int8 page geometry: each side's ps per-token f32 scales bit-pack into
`scale_rows_per_side(ps, d) = 4 * ceil(ps/d)` int8 rows of d lanes —
4 rows lane-padded when ps < d, one 4-row group per d tokens when ps is a
multiple of d. The only rejected geometry is ps > d with ps % d != 0
(a scale group would straddle a row boundary); use ops/paged.py's
separate-array layout there.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_flash_attention_tpu.ops.quant import INT8_MAX

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)


def _widen(stat, width):
    """Widen a (rows, 128) stat to `width` lanes; see ops/paged.py."""
    if width % 128 == 0:
        return jnp.tile(stat, (1, width // 128))
    return stat[:, :1]


def _auto_pages_per_block(pages_per_seq: int, page_size: int,
                          cap: int) -> int:
    """Largest divisor of pages_per_seq with block <= cap*128 tokens."""
    cap = max(1, cap * 128 // max(page_size, 1))
    best = 1
    for ppb in range(1, pages_per_seq + 1):
        if pages_per_seq % ppb == 0 and ppb <= cap:
            best = ppb
    return best


# --- page packing -------------------------------------------------------------


def pack_kv_page_bf16(k_page: jax.Array, v_page: jax.Array) -> jax.Array:
    """(ps, d) + (ps, d) bf16 -> (2ps, d) fused page."""
    return jnp.concatenate([k_page, v_page], axis=-2)


def scale_rows_per_side(page_size: int, d: int) -> int:
    """int8 rows holding one side's per-token f32 scales (see module doc)."""
    if page_size <= d:
        return 4
    assert page_size % d == 0, (
        f"int8 fused pages need page_size <= head_dim or a multiple of it "
        f"({page_size}, {d}); use ops/paged.py otherwise")
    return 4 * (page_size // d)


def _pack_scale_rows(scales: jax.Array, d: int) -> jax.Array:
    """(..., ps) f32 -> (..., scale_rows_per_side(ps, d), d) int8.

    byte j of token i lands at [4*(i//d) + j, i % d]."""
    ps = scales.shape[-1]
    lead = scales.shape[:-1]
    if ps <= d:
        b = jax.lax.bitcast_convert_type(scales, jnp.int8)   # (..., ps, 4)
        b = jnp.swapaxes(b, -1, -2)                          # (..., 4, ps)
        if ps < d:
            pad = [(0, 0)] * (b.ndim - 1) + [(0, d - ps)]
            b = jnp.pad(b, pad)
        return b
    groups = ps // d
    g = scales.reshape(*lead, groups, d)
    b = jax.lax.bitcast_convert_type(g, jnp.int8)            # (..., g, d, 4)
    b = jnp.swapaxes(b, -1, -2)                              # (..., g, 4, d)
    return b.reshape(*lead, 4 * groups, d)


def quantize_kv_page_int8(k_page: jax.Array, v_page: jax.Array) -> jax.Array:
    """(ps, d) x2 float -> (2ps + 2*scale_rows, d) int8 fused page."""
    ps, d = k_page.shape[-2:]
    scale_rows_per_side(ps, d)   # validate the geometry

    def q(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.where(amax == 0.0, 1.0, amax / INT8_MAX)
        vals = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                        -INT8_MAX, INT8_MAX).astype(jnp.int8)
        return vals, scale[..., 0]

    kq, ks = q(k_page)
    vq, vs = q(v_page)
    return jnp.concatenate(
        [kq, vq, _pack_scale_rows(ks, d), _pack_scale_rows(vs, d)], axis=-2)


def pack_paged_cache(k_pages: jax.Array, v_pages: jax.Array,
                     fmt: str = "bf16") -> jax.Array:
    """(hkv, np, ps, d) K and V page arrays -> fused pages array."""
    if fmt == "bf16":
        return jax.vmap(jax.vmap(pack_kv_page_bf16))(k_pages, v_pages)
    if fmt == "int8":
        return jax.vmap(jax.vmap(quantize_kv_page_int8))(k_pages, v_pages)
    raise ValueError(fmt)


# --- token append -------------------------------------------------------------


def _append_kernel(page_ids_ref, rows_ref, kq_ref, vq_ref, ksb_ref, vsb_ref,
                   pages_in, pages_out, sems, *, page_size: int,
                   quantized: bool):
    """Writes one token's K/V row (+ packed scale bytes) per (head, seq)
    straight into the fused pages in HBM. pages_out aliases pages_in, so
    the updates are in place; everything else in the array is untouched.

    Each destination is a tiny rectangular slice of the page:
      K payload   (1, d)  at row `row`
      V payload   (1, d)  at row  ps + row
      K scales    (4, 1)  at rows 2ps   + 4*(row//d), lane row % d
      V scales    (4, 1)  at rows 2ps+sr+ 4*(row//d), lane row % d
    All copies start before any waits so their latencies overlap.

    Source layout constraint: each per-token source is carried as the full
    trailing (1, d) / (4, 1) block of a 4-D ref so the DMA slices only the
    leading (untiled) dims — slicing a 1-row/1-lane window out of a tiled
    VMEM dim is sub-tile and rejected by Mosaic.
    """
    del pages_in
    hkv, B = kq_ref.shape[0], kq_ref.shape[1]
    ps = page_size
    d = kq_ref.shape[-1]
    sr = 4 * max(1, ps // d)

    def copies(h, b):
        pid = page_ids_ref[b]
        row = rows_ref[b]
        out = [
            pltpu.make_async_copy(
                kq_ref.at[h, b],
                pages_out.at[h, pid, pl.ds(row, 1), :],
                sems.at[h, b, 0]),
            pltpu.make_async_copy(
                vq_ref.at[h, b],
                pages_out.at[h, pid, pl.ds(ps + row, 1), :],
                sems.at[h, b, 1]),
        ]
        if quantized:
            srow = 2 * ps + 4 * (row // d)
            lane = row % d
            out.append(pltpu.make_async_copy(
                ksb_ref.at[h, b],
                pages_out.at[h, pid, pl.ds(srow, 4), pl.ds(lane, 1)],
                sems.at[h, b, 2]))
            out.append(pltpu.make_async_copy(
                vsb_ref.at[h, b],
                pages_out.at[h, pid, pl.ds(sr + srow, 4), pl.ds(lane, 1)],
                sems.at[h, b, 3]))
        return out

    started = [c for h in range(hkv) for b in range(B) for c in copies(h, b)]
    for c in started:
        c.start()
    for c in started:
        c.wait()


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def fused_page_append(
    fused_pages: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    page_ids: jax.Array,
    rows: jax.Array,
    *,
    page_size: int,
    interpret: Optional[bool] = None,
):
    """Appends one token per sequence into the fused page cache, in place.

    fused_pages: (hkv, num_pages, prows, d) in the fused format above.
    k_new/v_new: (B, hkv, d) new K/V rows (any float dtype; quantized here
    when the cache is int8). page_ids/rows: (B,) int32 target page and
    row-within-page. Returns the updated pages array (same buffer under
    jit thanks to input/output aliasing).

    Would replace the XLA scatter path: the int8 scatter decomposition is
    2 payload scatters + 8 single-byte scale scatters, each serialized on
    TPU; here the whole append is 2 (bf16) or 4 (int8) small DMAs per
    (head, sequence), all in flight together. Decode-step analog of the
    reference's in-loop cache write (flash_attention_c/csrc/attn.cpp
    decode path: kv_len = i + 1 + gap grows as rows land in the cache).

    TOOLCHAIN LIMIT: current Mosaic rejects DMA windows smaller than the
    destination's sublane tile ("Slice shape along dimension N must be
    aligned to tiling"), and a 1-token row is inherently sub-tile for
    bf16 (packed (2,128)) and int8 ((4,128)) pages. Measured probe: only
    full trailing (1,128)-of-int32 blocks indexed on leading dims
    compile, which this page format cannot express without doubling
    int8's bytes/token. The engine therefore dispatches the scatter path
    (models/inference._append_rows); this kernel remains the
    interpret-mode surface asserting the format's DMA decomposition.
    """
    hkv, num_pages, prows, d = fused_pages.shape
    B = k_new.shape[0]
    quantized = fused_pages.dtype == jnp.int8
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # per-token sources as full trailing blocks: payloads (hkv, B, 1, d),
    # scale bytes (hkv, B, 4, 1) — see the layout note in _append_kernel
    kt = jnp.swapaxes(k_new, 0, 1)            # (hkv, B, d)
    vt = jnp.swapaxes(v_new, 0, 1)
    if quantized:
        def q(x):
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                           keepdims=True)
            scale = jnp.where(amax == 0.0, 1.0, amax / INT8_MAX)
            vals = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                            -INT8_MAX, INT8_MAX).astype(jnp.int8)
            return vals, scale[..., 0]
        kq, ks = q(kt)
        vq, vs = q(vt)
        # (hkv, B) f32 -> (hkv, B, 4, 1) int8: byte j of token b at row j,
        # matching _pack_scale_rows's byte-j-at-row-j layout
        ksb = jax.lax.bitcast_convert_type(ks, jnp.int8)[..., None]
        vsb = jax.lax.bitcast_convert_type(vs, jnp.int8)[..., None]
    else:
        kq = kt.astype(fused_pages.dtype)
        vq = vt.astype(fused_pages.dtype)
        ksb = jnp.zeros((hkv, B, 4, 1), jnp.int8)
        vsb = ksb
    kq = kq[:, :, None, :]
    vq = vq[:, :, None, :]

    kernel = functools.partial(_append_kernel, page_size=page_size,
                               quantized=quantized)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            # sources pinned to HBM: the copies are HBM->HBM scatters, and
            # HBM refs are untiled so the 1-row / 1-lane windows are legal
            # (a bf16 VMEM ref's (2,128) packed tiling rejects them)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((hkv, B, 4))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(fused_pages.shape,
                                        fused_pages.dtype)],
        # inputs 0-1 are the scalar-prefetch operands; pages is input 6
        input_output_aliases={6: 0},
        interpret=interpret,
    )(page_ids, rows, kq, vq, ksb, vsb, fused_pages)[0]


# --- kernel -------------------------------------------------------------------


def _fused_decode_kernel(
    lengths_ref, page_indices_ref,
    q_ref, pages_hbm,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr, buf, sems, buf_idx,
    *,
    batch: int,
    hkv: int,
    pages_per_block: int,
    pages_per_seq: int,
    page_size: int,
    sm_scale: float,
    quantized: bool,
    window,
):
    b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    bk = pages_per_block * page_size
    ps = page_size
    length = lengths_ref[b]
    n_blocks = pl.cdiv(length, bk)

    def lo_block(ln):
        """First LOGICAL block inside the sliding window for a length."""
        if window is None:
            return jnp.int32(0)
        return jnp.maximum(ln - window, 0) // bk

    # The grid index i is window-relative; li is the logical block. With a
    # window, logical blocks keep growing with the sequence while the grid
    # stays max_blocks wide, and page lookups wrap modulo the table width —
    # the cache is a RING: a fixed set of pages_per_seq pages holds the
    # last window of tokens for an unbounded generation.
    lo = lo_block(length)
    li = lo + i

    def copies(bb, gi, hh, slot):
        lnb = lengths_ref[bb]
        lib = lo_block(lnb) + gi
        off = bb * pages_per_seq
        out = []
        for p in range(pages_per_block):
            idx = (lib * pages_per_block + p) % pages_per_seq
            page = page_indices_ref[off + idx]
            out.append(pltpu.make_async_copy(
                pages_hbm.at[hh, page], buf.at[slot, p], sems.at[slot, p]))
        return out

    @pl.when(li * bk < length)
    def _run():
        @pl.when(i == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        @pl.when((b == 0) & (h == 0) & (i == 0))
        def _bootstrap():
            buf_idx[0] = 0
            for c in copies(b, i, h, 0):
                c.start()

        slot = buf_idx[0]
        nxt_in_seq = li + 1 < n_blocks
        nb = jnp.where(nxt_in_seq, b, jnp.where(h + 1 < hkv, b, b + 1))
        nh = jnp.where(nxt_in_seq, h, jnp.where(h + 1 < hkv, h + 1, 0))
        ni = jnp.where(nxt_in_seq, i + 1, 0)

        @pl.when(nb < batch)
        def _prefetch():
            for c in copies(nb, ni, nh, 1 - slot):
                c.start()

        buf_idx[0] = 1 - slot

        for c in copies(b, i, h, slot):
            c.wait()

        # sm_scale*log2(e) folded into the tiny (G, d) q tile; stats run in
        # the log2 domain (exp2) and widen via jnp.tile, not 1-lane slice
        # broadcasts (see ops/flash.py).
        q = q_ref[0, 0]                                     # (G, d)
        q = (q * jnp.asarray(sm_scale * _LOG2E, q.dtype)).astype(q.dtype)

        d_lane = q_ref.shape[-1]
        sr = 4 * max(1, ps // d_lane)   # scale rows per side

        def unpack_scales(block):
            """(sr, d) int8 scale rows -> (1, ps) f32 per-token scales."""
            parts = [pltpu.bitcast(block[4 * g:4 * (g + 1)], jnp.float32)
                     for g in range(sr // 4)]
            sc = parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=1)
            return sc[:, :ps] if ps < d_lane else sc

        if quantized:
            # per-page dots with the scale folded into the score columns
            s_parts = []
            for p in range(pages_per_block):
                kp = buf[slot, p, :ps].astype(q_ref.dtype)  # (ps, d)
                kscale = unpack_scales(
                    buf[slot, p, 2 * ps:2 * ps + sr])       # (1, ps)
                sp = jax.lax.dot_general(
                    q, kp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s_parts.append(sp * kscale)
            s = jnp.concatenate(s_parts, axis=1)            # (G, bk)
        else:
            k = buf[slot, :, :ps].reshape(bk, -1)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        col = li * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = col < length
        if window is not None:
            ok &= col >= length - window
        s = jnp.where(ok, s, DEFAULT_MASK_VALUE)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p_ = jnp.exp2(s - _widen(m_next, bk))
        p_ *= _widen(m_next > 0.5 * DEFAULT_MASK_VALUE, bk)
        l_next = alpha * l_prev + jnp.sum(p_, axis=1, keepdims=True)
        m_scr[...], l_scr[...] = m_next, l_next

        if quantized:
            pv = jnp.zeros_like(acc_scr)
            for p in range(pages_per_block):
                vp = buf[slot, p, ps:2 * ps].astype(q_ref.dtype)
                vscale = unpack_scales(
                    buf[slot, p, 2 * ps + sr:2 * ps + 2 * sr])
                pcol = p_[:, p * ps:(p + 1) * ps] * vscale
                pv += jax.lax.dot_general(
                    pcol.astype(q_ref.dtype), vp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:
            v = buf[slot, :, ps:2 * ps].reshape(bk, -1)
            pv = jax.lax.dot_general(
                p_.astype(q_ref.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        d_acc = acc_scr.shape[-1]
        acc_scr[...] = acc_scr[...] * _widen(alpha, d_acc) + pv

        @pl.when(li == n_blocks - 1)
        def _epilogue():
            l = l_scr[...]
            l_safe = jnp.where((l == 0.0) | jnp.isnan(l), 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / _widen(l_safe, d_acc)).astype(
                o_ref.dtype)
            lse_ref[0, 0] = (m_scr[:, :1] * _LN2 +
                             jnp.log(l_safe[:, :1])).astype(lse_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "page_size", "sm_scale", "pages_per_block", "window", "interpret"))
def fused_paged_decode_attention(
    q: jax.Array,
    fused_pages: jax.Array,
    lengths: jax.Array,
    page_indices: jax.Array,
    *,
    page_size: int,
    sm_scale: Optional[float] = None,
    pages_per_block: Optional[int] = None,
    window: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Decode attention over fused KV pages (see module docstring).

    q: (batch, q_heads, d). fused_pages: (kv_heads, num_pages, rows, d) where
    rows = 2*page_size (bf16) or 2*page_size + 8 (int8 with packed scales).
    window: optional sliding window — attend only to the last `window`
    cache entries; blocks before the window are skipped entirely (neither
    DMA'd nor computed), so decode cost is O(window) instead of O(length).
    pages_per_block defaults to the largest divisor of pages_per_seq within
    the tuned cap (v5e sweep: bf16 peaks at ~16 pages/block = 743 GB/s of
    KV bandwidth, int8 keeps gaining to ~32 as the per-cell fixed costs
    amortize over half the bytes).
    Returns (out (batch, q_heads, d), lse (batch, q_heads)).
    """
    batch, hq, d = q.shape
    hkv, num_pages, rows, _ = fused_pages.shape
    quantized = fused_pages.dtype == jnp.int8
    expect_rows = 2 * page_size + (
        2 * scale_rows_per_side(page_size, d) if quantized else 0)
    assert rows == expect_rows, (rows, expect_rows)
    assert hq % hkv == 0
    group = hq // hkv
    pages_per_seq = page_indices.shape[1]
    if pages_per_block is None:
        pages_per_block = _auto_pages_per_block(
            pages_per_seq, page_size, cap=32 if quantized else 16)
    assert pages_per_seq % pages_per_block == 0
    if window is None:
        max_blocks = pages_per_seq // pages_per_block
    else:
        # ring mode: the grid covers the window's block span, independent
        # of sequence length — the window band can straddle one block
        # boundary, hence the +1
        bk = pages_per_block * page_size
        max_blocks = -(-window // bk) + 1
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    g_pad = max(8, ((group + 7) // 8) * 8)
    qg = q.reshape(batch, hkv, group, d)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    kernel = functools.partial(
        _fused_decode_kernel,
        batch=batch, hkv=hkv, pages_per_block=pages_per_block,
        pages_per_seq=pages_per_seq, page_size=page_size,
        sm_scale=sm_scale, quantized=quantized, window=window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, hkv, max_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, g_pad, d), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, g_pad, d), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, g_pad, 1), lambda b, h, i, *_: (b, h, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, d), jnp.float32),
            pltpu.VMEM((2, pages_per_block, rows, d), fused_pages.dtype),
            pltpu.SemaphoreType.DMA((2, pages_per_block)),
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
    )(lengths, page_indices.reshape(-1), qg, fused_pages)

    out = out[:, :, :group, :].reshape(batch, hq, d)
    lse = lse[:, :, :group, 0].reshape(batch, hq)
    return out, lse
