"""Pallas flash-attention-2 forward kernel family — the flagship device tier.

Brand-new TPU design of the capability the reference implements three times
(triton flash_attention_py/tiny_flash_attn_triton.py:49-207; raw CUDA
flash_attention_cuda/csrc/flash_attention.cu:16-156; CUTLASS/CuTe
flash_attention_cutlass/csrc/flash_attention.cu:373-685). Nothing is
translated: where the CUDA tiers hand-build smem tiles, cp.async pipelines
and warp shuffles, here the HBM->VMEM tile pipeline is expressed with
BlockSpecs (Mosaic inserts the double-buffered DMAs), the MXU runs both
matmuls with fp32 accumulation, and the online-softmax state (m, l, acc)
lives in VMEM scratch persisting across the sequential grid dimension.

Three TPU-specific design decisions carry the performance:

  1. WORK-LIST GRID. Causality is enforced by the grid itself, not by
     skipping tiles at run time: a scalar-prefetched work list enumerates
     exactly the (q_block, kv_block) pairs on or below the diagonal, so
     above-diagonal tiles cost neither DMA nor compute (the reference
     clamps its loop bound the same way, cutlass :536-540 — but its grid
     shape can depend on blockIdx, a Pallas grid cannot, hence the
     PrefetchScalarGridSpec indirection).
  2. GQA FOLDING. The q heads of one GQA group are folded into the q tile's
     row dimension, so each K/V tile is fetched once per KV HEAD, not once
     per q head — a group_size x reduction in cache bandwidth (the archived
     CPU tier indexes heads the same way, archive attn.cpp:140; here it
     buys DMA, not just indexing).
  3. MASK ONLY THE DIAGONAL. Only work items straddling the diagonal (or a
     padded tail) pay the iota/compare/select mask; interior tiles run the
     pure dot-softmax-dot pipeline (triton applies tl.where everywhere,
     :151-152 — on TPU the VPU mask cost is worth branching away).

Numerics: fp32 running max/sum, mask value -0.7*f32max (never -inf, ref
cutlass :228), empty-row guard (ref cutlass :620), LSE = m + log(l) output
for the backward (ref cutlass :756-759, triton :189-197).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_flash_attention_tpu.ops.configs import FlashConfig, default_config, LANES

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)

_FIRST, _LAST, _MASKED = 1, 2, 4


def _payload_to_compute(x, dtype):
    """Converts a (possibly quantized) K/V payload tile to the compute dtype.

    fp8-e4m3 -> bf16 is rebuilt with integer bit surgery (sign<<8, mantissa
    <<4, exponent rebias +120) instead of the generic float convert, which
    lowers much wider on the VPU. Zero is special-cased exactly; fp8
    denormals land slightly high (worst case code 0x01 -> 0.0068, i.e.
    7/16 * 2^-7 = 43.75% above the exact 2^-9), far below the fp8
    quantization noise itself. e4m3fn NaN codes (0x7F/0xFF) map to +/-480
    rather than propagating NaN — the quantizer never emits them, so this
    only matters for externally produced payloads. Other payloads use the
    native convert.
    """
    if x.dtype == dtype:
        return x
    if x.dtype == jnp.float8_e4m3fn and dtype == jnp.bfloat16:
        u = pltpu.bitcast(x, jnp.int8).astype(jnp.int32)
        sign = (u & 0x80) << 8
        mag = u & 0x7F
        bits = jnp.where(mag == 0, sign, sign | ((mag << 4) + (120 << 7)))
        return pltpu.bitcast(bits.astype(jnp.int16), jnp.bfloat16)
    return x.astype(dtype)


def _build_worklist(n_q: int, n_kv: int, block_q: int, block_kv: int,
                    q_len: int, kv_len: int, causal: bool,
                    window=None, segment_starts=None):
    """Static (qi, kvi, flags) triples: the tiles that actually run.

    For causal attention this is the on-or-below-diagonal triangle; a
    sliding window additionally drops tiles left of the band, so long-
    sequence SWA costs O(seq * window) tiles. STATIC segment boundaries
    (packed ragged sequences whose layout the host knows, e.g. engine
    admission) additionally drop tiles entirely before the q rows'
    segment — packed prefill costs sum(L_i^2)/2 instead of the full
    (sum L_i)^2/2 triangle. Rows of q blocks with no visible KV still get
    one (masked) item so their output is written (zeros via the empty-row
    guard).
    """
    offset = kv_len - q_len
    kv_pad = n_kv * block_kv != kv_len
    if segment_starts is not None:
        assert offset == 0, "segment_starts requires q_len == kv_len"
        starts = sorted(set([0] + [int(s) for s in segment_starts]))

        def seg_start(pos):
            lo = 0
            for b in starts:
                if b <= pos:
                    lo = b
            return lo
    qis, kvis, flags = [], [], []
    for qi in range(n_q):
        first_pos = qi * block_q + offset
        if causal:
            last_pos = qi * block_q + block_q - 1 + offset
            hi = min(n_kv, max(1, -(-(last_pos + 1) // block_kv)))
        else:
            hi = n_kv
            last_pos = q_len - 1 + offset
        lo = 0
        if window is not None:
            # earliest visible column across the tile = first row's left
            # band edge
            lo = min(max(0, (first_pos - window + 1) // block_kv), hi - 1)
        if segment_starts is not None:
            # earliest same-segment column across the tile = the FIRST
            # row's segment start (later rows start at or after it)
            lo = max(lo, min(seg_start(min(first_pos, q_len - 1))
                             // block_kv, hi - 1))
        for j in range(lo, hi):
            f = 0
            if j == lo:
                f |= _FIRST
            if j == hi - 1:
                f |= _LAST
            fully_valid = True
            if causal:
                # valid for every row iff valid for the tile's first row
                fully_valid = (j * block_kv + block_kv - 1
                               <= qi * block_q + offset)
            if window is not None:
                # left edge: valid for every row iff valid for the LAST row
                fully_valid = fully_valid and (
                    j * block_kv
                    >= qi * block_q + block_q - 1 + offset - window + 1)
            if kv_pad and (j + 1) * block_kv > kv_len:
                fully_valid = False
            if not fully_valid:
                f |= _MASKED
            qis.append(qi)
            kvis.append(j)
            flags.append(f)
    return (np.asarray(qis, np.int32), np.asarray(kvis, np.int32),
            np.asarray(flags, np.int32))


def _fwd_kernel(
    # scalar prefetch
    qi_ref, kvi_ref, flags_ref,
    # inputs (qseg/kvseg present only when with_segments)
    *refs,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_kv: int,
    group: int,
    q_len: int,
    kv_len: int,
    any_masked: bool,
    kv_padded: bool,
    kv_splits: int,
    with_segments: bool,
    window,
    quantized: bool = False,
    streams: int = 1,
):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    del refs[:3]
    kscale_ref = vscale_ref = None
    if quantized:
        kscale_ref, vscale_ref = refs[:2]
        del refs[:2]
    qseg_ref = kvseg_ref = None
    if with_segments:
        qseg_ref, kvseg_ref = refs[:2]
        del refs[:2]
    o_ref, lse_ref, *scr = refs
    m_scrs = [scr[3 * i] for i in range(streams)]
    l_scrs = [scr[3 * i + 1] for i in range(streams)]
    acc_scrs = [scr[3 * i + 2] for i in range(streams)]
    scr = scr[3 * streams:]
    diff_scr = scr[0] if len(scr) > 0 else None
    rmod_scr = scr[1] if len(scr) > 1 else None
    t = pl.program_id(2)
    qi = qi_ref[t]
    kvi = kvi_ref[t]
    flags = flags_ref[t]
    rows = group * block_q
    offset = kv_len - q_len

    @pl.when(flags & _FIRST != 0)
    def _init():
        for m_scr, l_scr, acc_scr in zip(m_scrs, l_scrs, acc_scrs):
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

    if diff_scr is not None:
        # Mask geometry table, built once per (b, h) walk of the work list
        # (t is the sequential grid dim): diff[r, c] = c - (r % block_q) is
        # invariant across work items AND across kv sub-tiles up to the
        # scalar shift si*sub — so one sub-tile-wide table serves every
        # sub-tile, and the hot path's mask shrinks to a compare-vs-scalar
        # + select instead of rebuilding iota/mod/sub tiles each time
        # (~halves the measured mask cost at ~1/kv_splits the VMEM a
        # full-width table would cost). Thresholds fold to per-item
        # scalars: valid iff diff <= qi*block_q + offset - kvi*block_kv
        # - si*sub.
        @pl.when(t == 0)
        def _mask_tables():
            ci = jax.lax.broadcasted_iota(jnp.int32, diff_scr.shape, 1)
            r = jax.lax.broadcasted_iota(jnp.int32, diff_scr.shape, 0)
            diff_scr[...] = ci - (r % block_q)
            if rmod_scr is not None:
                rr = jax.lax.broadcasted_iota(
                    jnp.int32, rmod_scr.shape, 0)
                rmod_scr[...] = rr % block_q

    precision = (jax.lax.Precision.HIGHEST
                 if q_ref.dtype == jnp.float32 else None)

    # q tile is (1, group, block_q, d): the GQA group's heads fetched as one
    # contiguous 4-D block, merged into rows with a free sublane reshape.
    # The softmax scale AND log2(e) are folded into the q tile here — a
    # (rows, d) multiply instead of a (rows, block_kv) one — which turns
    # every exp downstream into a raw exp2 (the triton tier's qk_scale =
    # sm_scale*1.44269504 trick, tiny_flash_attn_triton.py:133, done on the
    # cheap side of the dot). All running stats (m, s) live in the log2
    # domain; only the LSE epilogue converts back to natural log.
    q = q_ref[0].reshape(rows, q_ref.shape[-1])
    q = (q * jnp.asarray(sm_scale * _LOG2E, q.dtype)).astype(q.dtype)
    k_full = k_ref[0, 0]  # (block_kv, d)
    v_full = v_ref[0, 0]
    d_rep = acc_scrs[0].shape[-1] // LANES
    sub = block_kv // kv_splits

    # kv_splits > 1 unrolls the online-softmax update over sub-tiles of the
    # DMA'd KV block: sub-tile i+1's QK matmul has no data dependence on
    # sub-tile i's softmax, so Mosaic can issue MXU and VPU work in
    # parallel instead of strictly alternating (the stock kernel's
    # block_k vs block_k_major split, flash_attention.py pl.loop unroll).
    for si in range(kv_splits):
        # Each sub-tile's online-softmax state lives in its own stream
        # (si % streams): with streams > 1 there is NO data dependency
        # between consecutive sub-tiles' softmax chains, so the VPU work of
        # one can run under the MXU matmuls of the other; the streams merge
        # exactly in the epilogue.
        m_scr = m_scrs[si % streams]
        l_scr = l_scrs[si % streams]
        acc_scr = acc_scrs[si % streams]
        # Quantized payloads (int8 / fp8-e4m3 with per-token-row scales)
        # dequant around the matmuls: the payload converts to the compute
        # dtype per sub-tile on the VPU (overlapping the previous sub-tile's
        # softmax), and the scales fold as LINEAR factors — s *= kscale
        # commutes with the log2-domain exp trick, p *= vscale rides the
        # existing p pass (analog of the reference archive's per-thread
        # cast buffers, archive attn.cpp:250-351).
        k = _payload_to_compute(k_full[si * sub:(si + 1) * sub], q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if quantized:
            s *= kscale_ref[0, 0, :, si * sub:(si + 1) * sub]   # (1, sub)

        # Static mask specialization: a run-time branch (lax.cond) stalls
        # the Mosaic pipeline (~30% measured), and per-tile predication
        # saves less than the unconditional VPU mask costs (~9%), so when
        # any work item needs masking the whole compiled instance masks —
        # but the mask itself is built from the minimal static op set (no
        # kv-bound compare unless the kv axis is actually padded).
        if any_masked:
            col0 = kvi * block_kv + si * sub
            valid = None
            if causal:
                # diff[r, c] = (sub-tile col) - (row position within head),
                # precomputed in scratch; the si*sub column shift folds
                # into the per-item scalar threshold
                diff = diff_scr[...]
                valid = diff <= (qi * block_q + offset - col0)
                if window is not None:
                    # sliding window: col >= pos - window + 1
                    valid &= diff >= (qi * block_q + offset - window + 1
                                      - col0)
            if kv_padded:
                # global col = diff + (r % block_q) + col0 < kv_len
                col_ok = (diff_scr[...]
                          + jnp.tile(rmod_scr[...], (1, sub // LANES))
                          < kv_len - col0)
                valid = col_ok if valid is None else valid & col_ok
            if with_segments:
                # packed sequences: token pairs attend only within their
                # segment. qseg arrives 128 lanes wide per q row; widening
                # to (rows, sub) is a sublane+lane tile (the folded GQA
                # rows repeat the block_q pattern per head).
                qs = jnp.tile(qseg_ref[0], (group, sub // LANES))
                ks = kvseg_ref[0, :, si * sub:(si + 1) * sub]   # (1, sub)
                seg_ok = qs == ks
                valid = seg_ok if valid is None else valid & seg_ok
            s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        # The running stats live at full 128-lane width and are widened to
        # the tile width with jnp.tile (lane-block replication).
        # Broadcasting from a 1-lane slice (m_next[:, :1]) instead lowers
        # to a cross-lane gather in Mosaic that nearly DOUBLES the kernel's
        # step time — measured 52 -> 94 TF/s at 512x512 on v5e from this
        # change alone.
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - jnp.tile(m_next, (1, sub // LANES)))
        if any_masked and (with_segments or (causal and offset < 0)):
            # fully-masked-row guard: rows whose position precedes the
            # first kv (q_len > kv_len decode shapes) keep m at the mask
            # floor, making exp2(s - m) = 1 per masked column; zero those
            # rows (ref cutlass :620 empty-row case). Rows masked only by
            # padding are sliced off by the caller, so this multiply is
            # skipped unless offset < 0.
            p *= jnp.tile(m_next > 0.5 * DEFAULT_MASK_VALUE,
                          (1, sub // LANES))
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = _payload_to_compute(v_full[si * sub:(si + 1) * sub], q.dtype)
        if quantized:
            p = p * vscale_ref[0, 0, :, si * sub:(si + 1) * sub]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc_scr[...] = acc_scr[...] * jnp.tile(alpha, (1, d_rep)) + pv

    @pl.when(flags & _LAST != 0)
    def _epilogue():
        # Merge the independent streams with the exact log2-domain LSE
        # combine (the same identity ring attention uses across chips).
        m_f = m_scrs[0][...]
        for ms in m_scrs[1:]:
            m_f = jnp.maximum(m_f, ms[...])
        l_f = jnp.zeros_like(l_scrs[0][...])
        acc_f = jnp.zeros_like(acc_scrs[0][...])
        for ms, ls, accs in zip(m_scrs, l_scrs, acc_scrs):
            w = jnp.exp2(ms[...] - m_f)
            # empty stream: m == m_f == -inf -> exp2(nan); weight is 0
            w = jnp.where(jnp.isnan(w), 0.0, w) if len(m_scrs) > 1 else w
            l_f = l_f + ls[...] * w
            acc_f = acc_f + accs[...] * jnp.tile(w, (1, d_rep))
        l_safe = jnp.where((l_f == 0.0) | jnp.isnan(l_f), 1.0, l_f)
        o_ref[0] = (acc_f / jnp.tile(l_safe, (1, d_rep))).astype(
            o_ref.dtype).reshape(o_ref.shape[1:])
        # m is in the log2 domain (scale*log2e folded into q); the LSE
        # output stays natural-log for the backward (ref cutlass :614-623)
        lse_ref[0] = (m_f[:, :1] * _LN2 + jnp.log(l_safe[:, :1])).astype(
            lse_ref.dtype).reshape(lse_ref.shape[1:])


def _flash_fwd_impl(q, k, v, segment_ids, causal, sm_scale, config,
                    window=None, k_scales=None, v_scales=None,
                    segment_starts=None):
    """Runs the forward pallas_call; returns (out, lse).

    k/v may be quantized payloads (int8 / float8_e4m3fn) when k_scales /
    v_scales (b, hkv, kv_len, 1) are given; dequant is fused in-kernel.
    """
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, dk = k.shape
    assert dk == d and v.shape == k.shape, (q.shape, k.shape, v.shape)
    quantized = k_scales is not None
    group = hq // hkv

    # Kernel-family dispatch: the one-shot triangle kernel owns the plain
    # causal prefill regime (see flash_tri.py header for the measured
    # factorization it removes); everything else runs the work-list grid.
    choice = getattr(config, "kernel", "worklist")
    if choice in ("auto", "tri", "tri_block"):
        from tiny_flash_attention_tpu.ops import flash_tri
        if choice == "tri":
            assert causal and q_len == kv_len and window is None \
                and segment_ids is None and segment_starts is None, \
                "kernel='tri' covers plain causal q_len == kv_len only"
        elif choice == "tri_block":
            assert causal and q_len == kv_len and segment_ids is None \
                and segment_starts is None, \
                "kernel='tri_block' covers causal q_len == kv_len " \
                "(optionally windowed) only"
        tri_kw = dict(sm_scale=sm_scale,
                      sub=getattr(config, "tri_sub", 256),
                      leaf=getattr(config, "tri_leaf", 0) or None,
                      k_scales=k_scales, v_scales=v_scales,
                      interpret=config.interpret)
        if choice == "tri" or (
                choice == "auto" and window is None
                and flash_tri.tri_eligible(
                    q.shape, hkv, kv_len, causal, window, segment_ids,
                    segment_starts, q.dtype, quantized=quantized)):
            return flash_tri.tri_flash_fwd(q, k, v, **tri_kw)
        # One-shot working set too big (long S) or sliding window: the
        # q-banded sweep keeps the rect geometry, VMEM linear in S.
        if choice == "tri_block" or (
                choice == "auto" and flash_tri.tri_block_eligible(
                    q.shape, hkv, kv_len, causal, window, segment_ids,
                    segment_starts, q.dtype,
                    sub=getattr(config, "tri_sub", 256),
                    quantized=quantized)):
            return flash_tri.tri_block_fwd(q, k, v, window=window,
                                           **tri_kw)
    # Keep the folded q tile (group*block_q rows) near the configured size.
    block_q = max(LANES, _round_up(config.block_q // group, LANES))
    block_q = min(block_q, _round_up(q_len, LANES))
    block_kv = min(config.block_kv, _round_up(kv_len, LANES))

    d_pad = _round_up(d, LANES)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_kv)
    n_q, n_kv = q_pad // block_q, kv_pad // block_kv
    rows = group * block_q

    q = _pad4(q, q_pad, d_pad)
    k = _pad4(k, kv_pad, d_pad)
    v = _pad4(v, kv_pad, d_pad)

    qis, kvis, flags = _build_worklist(
        n_q, n_kv, block_q, block_kv, q_len, kv_len, causal, window=window,
        segment_starts=segment_starts)
    T = len(qis)
    with_segments = segment_ids is not None
    any_masked = bool((flags & _MASKED).any()) or with_segments

    kv_splits = config.kv_splits
    while block_kv % (kv_splits * LANES) and kv_splits > 1:
        kv_splits //= 2
    streams = max(1, min(getattr(config, "stats_streams", 1), kv_splits))
    kernel = functools.partial(
        _fwd_kernel, causal=causal, sm_scale=sm_scale, block_q=block_q,
        block_kv=block_kv, group=group, q_len=q_len, kv_len=kv_len,
        any_masked=any_masked, kv_padded=kv_pad != kv_len,
        kv_splits=kv_splits, with_segments=with_segments, window=window,
        quantized=quantized, streams=streams)

    flops_mask = 0.5 if causal else 1.0
    cost = pl.CostEstimate(
        flops=int(4 * bs * hq * q_len * kv_len * d * flops_mask),
        bytes_accessed=int((2 * q.size + k.size + v.size) * q.dtype.itemsize),
        transcendentals=int(bs * hq * q_len * kv_len * flops_mask),
    )

    in_specs = [
        # the GQA group's q heads arrive as one 4-D block: block index
        # h along the head dim selects heads [h*group, (h+1)*group)
        pl.BlockSpec((1, group, block_q, d_pad),
                     lambda b, h, t, qi, kvi, fl: (b, h, qi[t], 0)),
        pl.BlockSpec((1, 1, block_kv, d_pad),
                     lambda b, h, t, qi, kvi, fl: (b, h, kvi[t], 0)),
        pl.BlockSpec((1, 1, block_kv, d_pad),
                     lambda b, h, t, qi, kvi, fl: (b, h, kvi[t], 0)),
    ]
    operands = [q, k, v]
    if quantized:
        # per-token-row dequant scales, pre-transposed to (b, hkv, 1, s_pad)
        # so their tiles are lane-oriented and the column-wise multiplies
        # need no relayout
        ks = _pad_lane(jnp.swapaxes(k_scales, 2, 3), kv_pad)
        vs = _pad_lane(jnp.swapaxes(v_scales, 2, 3), kv_pad)
        operands += [ks, vs]
        in_specs += [
            pl.BlockSpec((1, 1, 1, block_kv),
                         lambda b, h, t, qi, kvi, fl: (b, h, 0, kvi[t])),
            pl.BlockSpec((1, 1, 1, block_kv),
                         lambda b, h, t, qi, kvi, fl: (b, h, 0, kvi[t])),
        ]
    if with_segments:
        qseg, kvseg = segment_ids
        assert qseg.shape == (bs, q_len) and kvseg.shape == (bs, kv_len), (
            qseg.shape, kvseg.shape)
        # q segment ids 128 lanes wide (1-lane blocks are pathological,
        # see the stats note in the kernel); kv ids lane-oriented. Padded
        # positions get id -1 (q pad rows are sliced off; kv pad columns
        # are masked by kv_padded, so -1 is only defensive).
        qseg_w = jnp.broadcast_to(
            _pad_rows(qseg.astype(jnp.int32), q_pad)[..., None],
            (bs, q_pad, LANES))
        kvseg_l = _pad_rows(kvseg.astype(jnp.int32), kv_pad)[:, None, :]
        operands += [qseg_w, kvseg_l]
        in_specs += [
            pl.BlockSpec((1, block_q, LANES),
                         lambda b, h, t, qi, kvi, fl: (b, qi[t], 0)),
            pl.BlockSpec((1, 1, block_kv),
                         lambda b, h, t, qi, kvi, fl: (b, 0, kvi[t])),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bs, hkv, T),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, group, block_q, d_pad),
                         lambda b, h, t, qi, kvi, fl: (b, h, qi[t], 0)),
            pl.BlockSpec((1, group, block_q, 1),
                         lambda b, h, t, qi, kvi, fl: (b, h, qi[t], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),   # running max m
            pltpu.VMEM((rows, LANES), jnp.float32),   # running sum l
            pltpu.VMEM((rows, d_pad), jnp.float32),   # output accumulator
        ] * streams + (
            [pltpu.VMEM((rows, block_kv // kv_splits), jnp.int32)]
             # sub-tile-wide mask diff table
             if any_masked and (causal or kv_pad != kv_len) else [])
          + ([pltpu.VMEM((rows, LANES), jnp.int32)]      # r % block_q
             if any_masked and kv_pad != kv_len else []),
    )

    # The default scoped-vmem budget is 16 MiB; the mask table plus large
    # folded q tiles can exceed it (v5e has 128 MiB physical VMEM), so
    # raise the cap for this kernel only.
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)
    if config.use_dimension_semantics:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 2**20)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bs, hq, q_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, hq, q_pad, 1), jnp.float32),
        ],
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=config.interpret,
    )(jnp.asarray(qis), jnp.asarray(kvis), jnp.asarray(flags), *operands)

    return out[:, :, :q_len, :d], lse[:, :, :q_len, 0]


# --- custom VJP wiring -------------------------------------------------------
# The reference emits the LSE "for a (never-implemented) backward"
# (SURVEY.md section 5 checkpoint row); here the backward exists: Pallas dq +
# dkv kernels in flash_bwd.py, attached via custom_vjp so the flagship kernel
# is trainable end-to-end.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, segment_ids, causal, sm_scale, config, window,
           segment_starts=None):
    out, _ = _flash_fwd_impl(q, k, v, segment_ids, causal, sm_scale, config,
                             window=window, segment_starts=segment_starts)
    return out


def _flash_fwd_rule(q, k, v, segment_ids, causal, sm_scale, config, window,
                    segment_starts=None):
    out, lse = _flash_fwd_impl(q, k, v, segment_ids, causal, sm_scale,
                               config, window=window,
                               segment_starts=segment_starts)
    return out, (q, k, v, segment_ids, out, lse)


def _flash_bwd_rule(causal, sm_scale, config, window, segment_starts,
                    res, g):
    from tiny_flash_attention_tpu.ops.flash_bwd import flash_attention_bwd
    q, k, v, segment_ids, out, lse = res
    choice = getattr(config, "kernel", "worklist")
    if choice in ("auto", "tri", "tri_block"):
        from tiny_flash_attention_tpu.ops import flash_tri_bwd
        bwd_kw = dict(sm_scale=sm_scale,
                      sub=getattr(config, "tri_sub", 256),
                      leaf=getattr(config, "tri_leaf", 0) or 128,
                      interpret=config.interpret)
        if choice == "tri" or (
                choice == "auto" and flash_tri_bwd.tri_bwd_eligible(
                    q.shape, k.shape[1], k.shape[2], causal, window,
                    segment_ids, segment_starts, q.dtype)):
            dq, dk, dv = flash_tri_bwd.tri_flash_bwd(
                q, k, v, out, lse, g, **bwd_kw)
            return dq, dk, dv, None
        # long S: the row-banded grid keeps the triangle emission with
        # q-side windows bounded; dk/dv accumulate across band steps
        if (choice == "tri_block" and window is None) or (
                choice == "auto" and flash_tri_bwd.tri_bwd_band_eligible(
                    q.shape, k.shape[1], k.shape[2], causal, window,
                    segment_ids, segment_starts, q.dtype)):
            dq, dk, dv = flash_tri_bwd.tri_flash_bwd_banded(
                q, k, v, out, lse, g, **bwd_kw)
            return dq, dk, dv, None
    # tuned on v5e (chained timing, all three grads live): 512x512 wins
    # (86 TF/s effective vs 46 at 256x256)
    bwd_block = min(512, max(config.block_q, 128), max(config.block_kv, 128))
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, lse, g, causal=causal, sm_scale=sm_scale,
        segment_ids=segment_ids, window=window,
        block_q=bwd_block, block_kv=bwd_block, interpret=config.interpret,
        segment_starts=segment_starts)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "window", "config", "return_lse",
                     "segment_starts"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    segment_ids=None,
    window: Optional[int] = None,
    segment_starts=None,
    config: Optional[FlashConfig] = None,
    return_lse: bool = False,
):
    """Flash-attention-2 forward (differentiable).

    Args:
      q: (batch, q_heads, q_len, head_dim)
      k, v: (batch, kv_heads, kv_len, head_dim); q_heads % kv_heads == 0 (GQA)
      causal: two-level causal masking incl. decode shapes (q_len != kv_len)
      sm_scale: softmax scale, default 1/sqrt(head_dim)
      segment_ids: optional (q_seg (b, q_len), kv_seg (b, kv_len)) int32
        pair for packed sequences — only tokens with the same id attend
        each other (stock splash/flash semantics: padding tokens sharing
        an id attend among themselves; slice their rows away)
      window: optional sliding-window size (requires causal): each token
        attends to positions [pos - window + 1, pos]. The work-list grid
        enumerates only the band, so cost is O(seq * window)
      segment_starts: optional STATIC tuple of segment start positions for
        packed sequences whose layout the host knows (engine admission):
        prunes the work list to the block-diagonal, so packed ragged
        prefill costs sum(L_i^2)/2 tiles. Pass segment_ids too (they
        carry the runtime mask); requires q_len == kv_len
      config: tile geometry; defaults via the (dtype, head_dim) dispatch table
      return_lse: also return log-sum-exp (batch, q_heads, q_len) float32
        (ref cutlass flash_attention.cu:756-771 returns {out, softmax_lse})

    Returns: out (same shape/dtype as q), and lse if requested.
    """
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, _ = k.shape
    assert hq % hkv == 0, f"GQA needs q_heads {hq} % kv_heads {hkv} == 0"
    if segment_ids is not None:
        segment_ids = (jnp.asarray(segment_ids[0]), jnp.asarray(segment_ids[1]))
    if window is not None:
        assert causal, "sliding window requires causal=True"
        assert window >= 1, window
        window = int(window)
    if segment_starts is not None:
        assert segment_ids is not None, (
            "segment_starts prunes scheduling; segment_ids carry the mask")
        segment_starts = tuple(int(x) for x in segment_starts)
    if q.dtype == jnp.float16:
        # Mosaic has no f16 vector type; bf16 compute (round 1) measured
        # 1.35e-2 vs the fp32 oracle — over the reference's 1e-2 fp16 gate
        # (flash_attention_py/main.py:95-99). fp16 inputs therefore promote
        # to fp32 compute (fp32 tiles, HIGHEST-precision matmuls) so the
        # fp16 surface clears the gate honestly: the only residual error is
        # the fp16 input/output rounding itself (~6e-4 measured on chip).
        # Callers who want half-precision THROUGHPUT should pass bf16 —
        # that is the TPU-native half type.
        out = flash_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), causal=causal, sm_scale=sm_scale,
            segment_ids=segment_ids, window=window,
            segment_starts=segment_starts, config=config,
            return_lse=return_lse)
        if return_lse:
            return out[0].astype(jnp.float16), out[1]
        return out.astype(jnp.float16)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if config is None:
        # Small-problem routing: below ~512x512 tiles the Pallas grid's
        # fixed costs lose to XLA's fused softmax-attention (measured on
        # v5e: 0.4us vs 0.9us at the reference's 128x64 config), so the
        # dispatch table routes tiny shapes to the pure-XLA reference path
        # — the runtime analog of the reference's compile-time kernel
        # selection (cutlass static_switch.h). Explicit configs always take
        # the kernel path.
        if q_len <= 512 and kv_len <= 512:
            return _xla_attention(q, k, v, segment_ids, causal, sm_scale,
                                  return_lse, window=window)
        # Interpret mode on non-TPU backends: the CPU-runnable "standalone"
        # equivalent (SURVEY.md section 4 implication).
        config = default_config(q.dtype, d, q_len, kv_len,
                                interpret=jax.default_backend() != "tpu",
                                causal=causal)
    if return_lse:
        return _flash_fwd_impl(q, k, v, segment_ids, causal, sm_scale,
                               config, window=window,
                               segment_starts=segment_starts)
    return _flash(q, k, v, segment_ids, causal, sm_scale, config, window,
                  segment_starts)


def _xla_attention(q, k, v, segment_ids, causal, sm_scale, return_lse,
                   window=None):
    """Fused-XLA attention for tiny shapes, kernel-identical semantics:
    GQA, decode-shaped causal masking, segments, empty-row guard,
    natural-log LSE."""
    bs, hq, q_len, d = q.shape
    hkv, kv_len = k.shape[1], k.shape[2]
    group = hq // hkv
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    guard = causal and kv_len < q_len
    if causal:
        offset = kv_len - q_len
        pos = jnp.arange(q_len)[:, None] + offset
        valid = jnp.arange(kv_len)[None, :] <= pos
        if window is not None:
            valid &= jnp.arange(kv_len)[None, :] >= pos - window + 1
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
    if segment_ids is not None:
        qseg, kvseg = segment_ids
        seg_ok = qseg[:, None, :, None] == kvseg[:, None, None, :]
        s = jnp.where(seg_ok, s, DEFAULT_MASK_VALUE)
        guard = True
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    if guard:
        p *= m > 0.5 * DEFAULT_MASK_VALUE   # fully-masked rows -> 0
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = jnp.einsum("bhqk,bhkd->bhqd", (p / l_safe).astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    if return_lse:
        lse = (m + jnp.log(l_safe))[..., 0]
        if guard:
            # fully-masked rows carry a sentinel; match the kernel's
            # log2-domain epilogue (m*ln2) so the two paths agree bit-wise
            lse = jnp.where(m[..., 0] > 0.5 * DEFAULT_MASK_VALUE, lse,
                            m[..., 0] * _LN2)
        return out, lse
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(x: jax.Array, to: int):
    """Pads the last axis of a (b, s) array to `to` with -1 ids."""
    if x.shape[-1] == to:
        return x
    return jnp.pad(x, ((0, 0), (0, to - x.shape[-1])), constant_values=-1)


def _pad_lane(x: jax.Array, s_to: int):
    """Pads the last (lane) axis of (b, h, 1, s) scales to s_to."""
    ps = s_to - x.shape[3]
    if ps == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, ps)))


def _pad4(x: jax.Array, s_to: int, d_to: int):
    ps, pd = s_to - x.shape[2], d_to - x.shape[3]
    if ps == 0 and pd == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, ps), (0, pd)))
