"""Pallas flash-attention backward kernels (dq, dk, dv).

The reference never implements a backward pass — it only emits the LSE a
backward would need (cutlass flash_attention.cu:756-759, triton
tiny_flash_attn_triton.py:189-197). This module completes that arc the TPU
way: FlashAttention-2 backward as two Pallas kernels with `jax.custom_vjp`
wiring (the custom-VJP pattern from the Pallas guide).

Math (per q row, with saved out O and lse L):
  di = rowsum(dO * O)
  p  = exp(s * scale - L)            -- softmax weights recomputed tile-wise
  dv += p^T @ dO
  dp = dO @ v^T
  ds = p * (dp - di) * scale
  dq += ds @ k;   dk += ds^T @ q

Two kernels with opposite iteration orders (the same split as the production
JAX implementation): dKV iterates q blocks per kv block, dQ iterates kv
blocks per q block — each accumulates its output in VMEM scratch across its
sequential grid dimension. GQA: dk/dv accumulate over the q-head group via an
extra sequential `group` grid dimension whose output block index is constant,
so the scratch keeps accumulating while q/do/lse walk the group's heads.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_flash_attention_tpu.ops.configs import LANES
from tiny_flash_attention_tpu.ops.flash import _pad_rows

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

_LOG2E = math.log2(math.e)


def _cdiv(a, b):
    return -(-a // b)


_BWD_FIRST, _BWD_LAST = 1, 2


def _seg_bounds_fns(segment_starts, seq_len):
    """(seg_start(pos), seg_end(pos)) helpers for STATIC packed layouts."""
    starts = sorted(set([0] + [int(x) for x in segment_starts]))

    def seg_start(pos):
        lo = 0
        for b in starts:
            if b <= pos:
                lo = b
        return lo

    def seg_end(pos):
        for b in starts:
            if b > pos:
                return b
        return seq_len

    return seg_start, seg_end


def _build_bwd_worklist(n_q, n_kv, block_q, block_kv, q_len, kv_len,
                        causal, window, segment_starts=None):
    """Static (kvi, qi) pairs, kv-major (dk/dv windows stay contiguous;
    dq[qi] completes at its last listed kvi).

    EVERY kv block gets at least one item and EVERY q block appears at
    least once (dead tiles — outside the window band, or q rows that
    attend nothing in q_len > kv_len shapes — carry one fully-masked item
    whose p is exactly zero), because an output block with no grid step
    would be returned as uninitialized memory where the semantics require
    zeros.
    """
    offset = kv_len - q_len
    if segment_starts is not None:
        assert offset == 0, "segment_starts requires q_len == kv_len"
        seg_start, seg_end = _seg_bounds_fns(segment_starts, q_len)
    kvis, qis, flags = [], [], []
    for kvi in range(n_kv):
        lo, hi = 0, n_q - 1
        if causal:
            lo = max(0, _cdiv(kvi * block_kv - block_q + 1 - offset,
                              block_q))
            if window is not None:
                hi = min(hi, (kvi * block_kv + block_kv + window - 2
                              - offset) // block_q)
        if segment_starts is not None:
            # q rows past the kv block's last segment cannot see it; rows
            # before its first segment cannot either
            kv_first = kvi * block_kv
            kv_last = min(kvi * block_kv + block_kv - 1, kv_len - 1)
            lo = max(lo, seg_start(kv_first) // block_q)
            hi = min(hi, (seg_end(kv_last) - 1) // block_q)
        if kvi == 0:
            lo = 0          # cover q blocks that attend nothing (masked)
        if hi < lo or lo > n_q - 1:
            lo = hi = min(max(lo, 0), n_q - 1)   # dead kv block: 1 item
        qlist = list(range(lo, hi + 1))
        for idx, qi in enumerate(qlist):
            kvis.append(kvi)
            qis.append(qi)
            flags.append((_BWD_FIRST if idx == 0 else 0) | (
                _BWD_LAST if idx == len(qlist) - 1 else 0))
    return (np.asarray(kvis, np.int32), np.asarray(qis, np.int32),
            np.asarray(flags, np.int32))


def _build_bwd_worklist_qmajor(n_q, n_kv, block_q, block_kv, q_len,
                               kv_len, causal, window,
                               segment_starts=None):
    """Static (qi, kvi, flags) triples, q-major, for the dq kernel: FIRST
    marks each qi's first live kv tile (scratch reset), LAST its last
    (result write). Every qi emits at least one item (a dead q block's
    single masked item flushes zeros)."""
    offset = kv_len - q_len
    if segment_starts is not None:
        assert offset == 0, "segment_starts requires q_len == kv_len"
        seg_start, seg_end = _seg_bounds_fns(segment_starts, q_len)
    qis, kvis, flags = [], [], []
    for qi in range(n_q):
        lo, hi = 0, n_kv - 1
        if causal:
            hi = min(hi, ((qi + 1) * block_q - 1 + offset) // block_kv)
            hi = max(hi, 0)
            if window is not None:
                lo = max(0, (qi * block_q + offset - window + 1) // block_kv)
                lo = min(lo, hi)
        if segment_starts is not None:
            # cols before the rows' first segment / after their last are
            # cross-segment for every row in the block
            first_pos = min(qi * block_q, q_len - 1)
            last_pos = min(qi * block_q + block_q - 1, q_len - 1)
            lo = max(lo, min(seg_start(first_pos) // block_kv, hi))
            hi = max(min(hi, (seg_end(last_pos) - 1) // block_kv), lo)
        for kvi in range(lo, hi + 1):
            f = (_BWD_FIRST if kvi == lo else 0) | (
                _BWD_LAST if kvi == hi else 0)
            qis.append(qi)
            kvis.append(kvi)
            flags.append(f)
    return (np.asarray(qis, np.int32), np.asarray(kvis, np.int32),
            np.asarray(flags, np.int32))






def _recompute_p(q, k, lse2, sm_scale, qi, kvi, block_q, block_kv,
                 q_len, kv_len, causal, kv_mask, precision, col0=None,
                 qs=None, ks=None, guard=False, window=None):
    """Recomputes the softmax tile p = exp(s*scale - lse).

    sm_scale*log2(e) is folded into the q tile so the whole computation is
    raw exp2; `lse2` arrives pre-scaled by log2(e) AND pre-broadcast to 128
    lanes (widened here with jnp.tile — a 1-lane slice broadcast lowers to a
    Mosaic cross-lane gather that dominates the step, see ops/flash.py).
    col0 overrides the absolute kv start column (sub-tiled callers);
    qs/ks are optional (block_q, LANES) / (1, block_kv) segment-id tiles;
    guard zeroes fully-masked rows via the lse sentinel.
    """
    if col0 is None:
        col0 = kvi * block_kv
    q = (q * jnp.asarray(sm_scale * _LOG2E, q.dtype)).astype(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    if causal or kv_mask:
        ci = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1)
        mask = None
        if causal:
            ri = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            diff = ci - ri
            mask = diff <= (qi * block_q + (kv_len - q_len) - col0)
            if window is not None:
                mask &= diff >= (
                    qi * block_q + (kv_len - q_len) - window + 1 - col0)
        if kv_mask:
            col_ok = col0 + ci < kv_len
            mask = col_ok if mask is None else (mask & col_ok)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    if qs is not None:
        seg_ok = jnp.tile(qs, (1, block_kv // LANES)) == ks
        s = jnp.where(seg_ok, s, DEFAULT_MASK_VALUE)
    p = jnp.exp2(s - jnp.tile(lse2, (1, block_kv // LANES)))
    if guard:
        # fully-masked rows carry the lse sentinel (~MASK); without this
        # their recomputed p is exp2(MASK - MASK) = 1 per column and the
        # row would pollute dk/dv with its (arbitrary) upstream gradient
        p *= jnp.tile(lse2 > 0.5 * DEFAULT_MASK_VALUE,
                      (1, block_kv // LANES))
    return p


def _bwd_dq_kernel(qi_ref, kvi_ref, flags_ref,
                   q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                   *refs, causal, sm_scale, block_q,
                   block_kv, q_len, kv_len, kv_mask, precision,
                   with_segments, guard, window):
    if with_segments:
        qseg_ref, kvseg_ref, dq_ref, dq_scr = refs
    else:
        dq_ref, dq_scr = refs
        qseg_ref = kvseg_ref = None
    t = pl.program_id(2)
    qi, kvi, flags = qi_ref[t], kvi_ref[t], flags_ref[t]

    @pl.when(flags & _BWD_FIRST != 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse2 = lse_ref[0, 0]         # (block_q, LANES), log2-domain
    di = di_ref[0, 0]            # (block_q, LANES)
    p = _recompute_p(
        q, k, lse2, sm_scale, qi, kvi, block_q, block_kv,
        q_len, kv_len, causal, kv_mask, precision,
        qs=None if qseg_ref is None else qseg_ref[0],
        ks=None if kvseg_ref is None else kvseg_ref[0],
        guard=guard, window=window)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    # ds here is unscaled by sm_scale; the scale is folded into the
    # (block_q, d) writeback below instead of a (block_q, block_kv) op
    ds = p * (dp - jnp.tile(di, (1, block_kv // LANES)))
    dq_scr[...] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(flags & _BWD_LAST != 0)
    def _done():
        dq_ref[0, 0] = (dq_scr[...] * sm_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(kvi_ref, qi_ref, flags_ref,
                    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                    *refs, causal, sm_scale,
                    group, block_q, block_kv, q_len, kv_len, kv_mask,
                    precision, with_segments, guard, window):
    if with_segments:
        qseg_ref, kvseg_ref, dk_ref, dv_ref, dk_scr, dv_scr = refs
    else:
        dk_ref, dv_ref, dk_scr, dv_scr = refs
        qseg_ref = kvseg_ref = None
    # grid: (bs, hkv, n_kv, group, n_q); dims 3 and 4 are sequential and the
    # dk/dv output block index ignores them, so scratch accumulates across
    # the whole q-head group and all q blocks. Grid (b, hk, T, g): the
    # work list is kv-major, so each kvi's scratch accumulation spans a
    # contiguous run of (t, g) steps.
    t, g = pl.program_id(2), pl.program_id(3)
    kvi, qi, flags = kvi_ref[t], qi_ref[t], flags_ref[t]

    @pl.when((flags & _BWD_FIRST != 0) & (g == 0))
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)


    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse2 = lse_ref[0, 0]         # (block_q, LANES), log2-domain
    di = di_ref[0, 0]            # (block_q, LANES)
    p = _recompute_p(
        q, k, lse2, sm_scale, qi, kvi, block_q, block_kv,
        q_len, kv_len, causal, kv_mask, precision,
        qs=None if qseg_ref is None else qseg_ref[0],
        ks=None if kvseg_ref is None else kvseg_ref[0],
        guard=guard, window=window)
    # dv += p^T @ dO
    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    ds = p * (dp - jnp.tile(di, (1, block_kv // LANES)))
    # dk += ds^T @ q (sm_scale folded into the writeback)
    dk_scr[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when((flags & _BWD_LAST != 0) & (g == group - 1))
    def _done():
        dk_ref[0, 0] = (dk_scr[...] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_fused_kernel(kvi_ref, qi_ref,
                      q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                      *refs,
                      causal, sm_scale, group, block_q, block_kv,
                      q_len, kv_len, kv_mask, precision, kv_splits,
                      with_segments, guard, window):
    if with_segments:
        (qseg_ref, kvseg_ref, dq_ref, dk_ref, dv_ref,
         dqa_scr, dka_scr, dva_scr) = refs
    else:
        dq_ref, dk_ref, dv_ref, dqa_scr, dka_scr, dva_scr = refs
        qseg_ref = kvseg_ref = None
    """Single-pass backward: 5 matmuls per visited tile instead of the
    split kernels' 7 (p and dp are recomputed once, not once per kernel).

    Grid (b, hkv, g, n_kv, n_q). dq accumulates in a full-q-length VMEM
    scratch (re-zeroed per g); dk/dv accumulate in full-kv-length scratch
    across the whole (g, kvi, qi) sweep. Every step overwrites its output
    blocks entirely from scratch slices, so Mosaic's output windows never
    need their previous contents: the last flush of a window carries the
    final value (the grid is sequential past the two parallel dims).
    """
    g, t = pl.program_id(2), pl.program_id(3)
    kvi = kvi_ref[t]
    qi = qi_ref[t]

    @pl.when((g == 0) & (t == 0))
    def _init_kv():
        dka_scr[...] = jnp.zeros_like(dka_scr)
        dva_scr[...] = jnp.zeros_like(dva_scr)

    @pl.when(t == 0)
    def _init_q():
        dqa_scr[...] = jnp.zeros_like(dqa_scr)


    # so there is no run predicate — the body executes unconditionally
    q = q_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse2 = lse_ref[0, 0]
    di = di_ref[0, 0]
    # kv sub-tiling: sub-tile chains are independent except the dq
    # accumulation, so Mosaic overlaps one sub-tile's softmax/ds VPU
    # work with the next one's matmuls (see ops/flash.py kv_splits).
    sub = block_kv // kv_splits
    for si in range(kv_splits):
        kv0 = kvi * block_kv + si * sub
        k = k_ref[0, 0, si * sub:(si + 1) * sub]
        v = v_ref[0, 0, si * sub:(si + 1) * sub]
        p = _recompute_p(
            q, k, lse2, sm_scale, qi, 0, block_q, sub, q_len, kv_len,
            causal, kv_mask, precision, col0=kv0,
            qs=None if qseg_ref is None else qseg_ref[0],
            ks=None if kvseg_ref is None
            else kvseg_ref[0, :, si * sub:(si + 1) * sub],
            guard=guard, window=window)
        dva_scr[pl.ds(kvi * block_kv + si * sub, sub)] += \
            jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        ds = p * (dp - jnp.tile(di, (1, sub // LANES)))
        dka_scr[pl.ds(kvi * block_kv + si * sub, sub)] += \
            jax.lax.dot_general(
                ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        dqa_scr[pl.ds(qi * block_q, block_q)] += jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    # Unconditional whole-block flushes (sm_scale folded here, idempotent);
    # every listed (kvi, qi) is live, so the windows are always valid.
    dq_ref[0, 0] = (dqa_scr[pl.ds(qi * block_q, block_q)]
                    * sm_scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = (dka_scr[pl.ds(kvi * block_kv, block_kv)]
                    * sm_scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dva_scr[pl.ds(kvi * block_kv, block_kv)].astype(
        dv_ref.dtype)


def _flash_bwd_fused(q, k, v, do, lsep, dip, segs, *, causal, sm_scale,
                     block_q, block_kv, q_len, kv_len, q_pad, kv_pad,
                     d_pad, kv_mask, precision, interpret, guard,
                     kv_splits=1, window=None, segment_starts=None):
    bs, hq = q.shape[:2]
    hkv = k.shape[1]
    group = hq // hkv
    n_q, n_kv = q_pad // block_q, kv_pad // block_kv

    # Work-list grid (the forward's design applied to the backward): a
    # scalar-prefetched list enumerates exactly the live (kvi, qi) pairs
    # of the causal/window band, so dead tiles cost neither grid steps
    # nor DMA.
    kvis, qis, _ = _build_bwd_worklist(n_q, n_kv, block_q, block_kv,
                                       q_len, kv_len, causal, window,
                                       segment_starts=segment_starts)
    T = len(kvis)

    qspec = pl.BlockSpec(
        (1, 1, block_q, d_pad),
        lambda b, hk, g, t, kj, qj, gr=group: (b, hk * gr + g, qj[t], 0))
    kvspec = pl.BlockSpec(
        (1, 1, block_kv, d_pad),
        lambda b, hk, g, t, kj, qj: (b, hk, kj[t], 0))
    rowspec = pl.BlockSpec(
        (1, 1, block_q, LANES),
        lambda b, hk, g, t, kj, qj, gr=group: (b, hk * gr + g, qj[t], 0))

    in_specs = [qspec, kvspec, kvspec, qspec, rowspec, rowspec]
    operands = [q, k, v, do, lsep, dip]
    if segs is not None:
        operands += list(segs)
        in_specs += [
            pl.BlockSpec((1, block_q, LANES),
                         lambda b, hk, g, t, kj, qj: (b, qj[t], 0)),
            pl.BlockSpec((1, 1, block_kv),
                         lambda b, hk, g, t, kj, qj: (b, 0, kj[t])),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bs, hkv, group, T),
        in_specs=in_specs,
        out_specs=[qspec, kvspec, kvspec],
        scratch_shapes=[pltpu.VMEM((q_pad, d_pad), jnp.float32),
                        pltpu.VMEM((kv_pad, d_pad), jnp.float32),
                        pltpu.VMEM((kv_pad, d_pad), jnp.float32)],
    )

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, causal=causal, sm_scale=sm_scale,
            group=group, block_q=block_q,
            block_kv=block_kv, q_len=q_len, kv_len=kv_len,
            kv_mask=kv_mask, precision=precision, kv_splits=kv_splits,
            with_segments=segs is not None, guard=guard, window=window),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bs, hq, q_pad, d_pad), q.dtype),
                   jax.ShapeDtypeStruct((bs, hkv, kv_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((bs, hkv, kv_pad, d_pad), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(kvis), jnp.asarray(qis), *operands)
    return dq, dk, dv


# VMEM budget for the fused path's persistent scratch (q + 2*kv slabs):
# 13 MB admits seqlen 8192 at d=128 (12.6 MB), verified to compile and run
# at 127 TF/s on v5e; longer sequences fall back to the split kernels.
_FUSED_SCRATCH_LIMIT = 13 * 1024 * 1024


def flash_attention_bwd(q, k, v, out, lse, do, *, causal, sm_scale,
                        segment_ids=None, window=None, block_q=128,
                        block_kv=128, kv_splits=1, interpret=False,
                        segment_starts=None):
    """Computes (dq, dk, dv). All arrays (b, h, s, d)-shaped like forward.

    segment_ids: optional (q_seg (b, q_len), kv_seg (b, kv_len)) matching
    the forward's packing mask.
    """
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, _ = k.shape
    group = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    precision = (jax.lax.Precision.HIGHEST
                 if q.dtype == jnp.float32 else None)

    d_pad = _round_up(d, LANES)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_kv)
    n_q, n_kv = q_pad // block_q, kv_pad // block_kv
    kv_mask = kv_pad != kv_len

    # di = rowsum(dO * O): cheap elementwise+reduce, fused by XLA. Both di
    # and the (log2-scaled) lse are materialized 128 lanes wide so the
    # kernels widen them with jnp.tile instead of a 1-lane slice broadcast.
    di = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                 axis=-1, keepdims=True)

    qp = _pad4(q, q_pad, d_pad)
    kp = _pad4(k, kv_pad, d_pad)
    vp = _pad4(v, kv_pad, d_pad)
    dop = _pad4(do, q_pad, d_pad)
    lsep = jnp.broadcast_to(
        _pad4(lse[..., None] * _LOG2E, q_pad, 1),
        (bs, hq, q_pad, LANES))
    dip = jnp.broadcast_to(_pad4(di, q_pad, 1), (bs, hq, q_pad, LANES))

    # Zero fully-masked rows' recomputed p (lse sentinel): needed for
    # q_len > kv_len decode shapes and for packed segments.
    guard = (causal and q_len > kv_len) or segment_ids is not None
    segs = None
    if segment_ids is not None:
        qseg, kvseg = segment_ids
        qseg_w = jnp.broadcast_to(
            _pad_rows(qseg.astype(jnp.int32), q_pad)[..., None],
            (bs, q_pad, LANES))
        kvseg_l = _pad_rows(kvseg.astype(jnp.int32), kv_pad)[:, None, :]
        segs = (qseg_w, kvseg_l)

    # Fused single-pass backward when its persistent scratch fits VMEM:
    # 5 matmuls per tile vs 7 across the split kernels (p and dp recompute
    # once), one input pass instead of two.
    if (q_pad + 2 * kv_pad) * d_pad * 4 <= _FUSED_SCRATCH_LIMIT:
        while block_kv % (kv_splits * LANES) and kv_splits > 1:
            kv_splits //= 2
        dq, dk, dv = _flash_bwd_fused(
            qp, kp, vp, dop, lsep, dip, segs, causal=causal,
            sm_scale=sm_scale,
            block_q=block_q, block_kv=block_kv, q_len=q_len, kv_len=kv_len,
            q_pad=q_pad, kv_pad=kv_pad, d_pad=d_pad, kv_mask=kv_mask,
            precision=precision, interpret=interpret, guard=guard,
            kv_splits=kv_splits, window=window,
            segment_starts=segment_starts)
        return (dq[:, :, :q_len, :d], dk[:, :, :kv_len, :d],
                dv[:, :, :kv_len, :d])

    # dq: q-major work list (the same dead-tile elimination as the fused
    # path, applied to the long-sequence fallback)
    dq_qis, dq_kvis, dq_flags = _build_bwd_worklist_qmajor(
        n_q, n_kv, block_q, block_kv, q_len, kv_len, causal, window,
        segment_starts=segment_starts)
    T_dq = len(dq_qis)
    qspec = pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, t, qj, kj, fl: (b, h, qj[t], 0))
    kvspec = pl.BlockSpec(
        (1, 1, block_kv, d_pad),
        lambda b, h, t, qj, kj, fl, g=group: (b, h // g, kj[t], 0))
    rowspec = pl.BlockSpec((1, 1, block_q, LANES),
                           lambda b, h, t, qj, kj, fl: (b, h, qj[t], 0))

    dq_in_specs = [qspec, kvspec, kvspec, qspec, rowspec, rowspec]
    dq_operands = [qp, kp, vp, dop, lsep, dip]
    if segs is not None:
        dq_operands += list(segs)
        dq_in_specs += [
            pl.BlockSpec((1, block_q, LANES),
                         lambda b, h, t, qj, kj, fl: (b, qj[t], 0)),
            pl.BlockSpec((1, 1, block_kv),
                         lambda b, h, t, qj, kj, fl: (b, 0, kj[t])),
        ]
    dq_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bs, hq, T_dq),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d_pad),
                               lambda b, h, t, qj, kj, fl: (b, h, qj[t], 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_kv=block_kv, q_len=q_len, kv_len=kv_len,
            kv_mask=kv_mask, precision=precision,
            with_segments=segs is not None, guard=guard, window=window),
        grid_spec=dq_grid_spec,
        out_shape=jax.ShapeDtypeStruct((bs, hq, q_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(dq_qis), jnp.asarray(dq_kvis), jnp.asarray(dq_flags),
      *dq_operands)

    # dkv: kv-major work list; grid (bs, hkv, T, group)
    dk_kvis, dk_qis, dk_flags = _build_bwd_worklist(
        n_q, n_kv, block_q, block_kv, q_len, kv_len, causal, window,
        segment_starts=segment_starts)
    T_dkv = len(dk_kvis)
    qspec2 = pl.BlockSpec(
        (1, 1, block_q, d_pad),
        lambda b, hk, t, g, kj, qj, fl, gr=group: (b, hk * gr + g,
                                                   qj[t], 0))
    kvspec2 = pl.BlockSpec(
        (1, 1, block_kv, d_pad),
        lambda b, hk, t, g, kj, qj, fl: (b, hk, kj[t], 0))
    rowspec2 = pl.BlockSpec(
        (1, 1, block_q, LANES),
        lambda b, hk, t, g, kj, qj, fl, gr=group: (b, hk * gr + g,
                                                   qj[t], 0))

    dkv_in_specs = [qspec2, kvspec2, kvspec2, qspec2, rowspec2, rowspec2]
    dkv_operands = [qp, kp, vp, dop, lsep, dip]
    if segs is not None:
        dkv_operands += list(segs)
        dkv_in_specs += [
            pl.BlockSpec((1, block_q, LANES),
                         lambda b, hk, t, g, kj, qj, fl: (b, qj[t], 0)),
            pl.BlockSpec((1, 1, block_kv),
                         lambda b, hk, t, g, kj, qj, fl: (b, 0, kj[t])),
        ]
    dkv_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bs, hkv, T_dkv, group),
        in_specs=dkv_in_specs,
        out_specs=[kvspec2, kvspec2],
        scratch_shapes=[pltpu.VMEM((block_kv, d_pad), jnp.float32),
                        pltpu.VMEM((block_kv, d_pad), jnp.float32)],
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, causal=causal, sm_scale=sm_scale,
            group=group, block_q=block_q, block_kv=block_kv, q_len=q_len,
            kv_len=kv_len, kv_mask=kv_mask, precision=precision,
            with_segments=segs is not None, guard=guard, window=window),
        grid_spec=dkv_grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bs, hkv, kv_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((bs, hkv, kv_pad, d_pad), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(dk_kvis), jnp.asarray(dk_qis), jnp.asarray(dk_flags),
      *dkv_operands)

    return (dq[:, :, :q_len, :d], dk[:, :, :kv_len, :d],
            dv[:, :, :kv_len, :d])


def _round_up(x, m):
    return ((x + m - 1) // m) * m



def _pad4(x, s_to, d_to):
    ps, pd = s_to - x.shape[2], d_to - x.shape[3]
    if ps == 0 and pd == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, ps), (0, pd)))
