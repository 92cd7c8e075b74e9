"""One-shot triangle-decomposition causal kernel — the round-3 headline path.

The work-list kernel (ops/flash.py) pays a measured, exactly-factorized tax
on causal shapes: causal = nc_eff(geometry) x sched x X, where
sched = 1/(1 + block_q_head/S) is the diagonal-tile quantization (rows are
scheduled against every kv column of their q tile, valid or not) and
nc_eff grows with the grid-step row fold (138.6 TF/s at 2048 folded rows
vs 155.3 at 8192 on v5e, s2048 d128 GQA). The two levers fight: big folds
amortize per-step overhead but collapse sched (0.5 at whole-sequence
folds). See BASELINE.md "Causal-gap breakdown".

This kernel decouples them. One grid step per (batch, kv head) holds the
ENTIRE problem in VMEM (q: all GQA-group heads, K/V: the whole sequence)
and emits the causal triangle as a statically unrolled COLUMN SWEEP: for
each kv chunk j of width `sub`,

    leaf:  rows [j*sub, (j+1)*sub)  x cols [j*sub, (j+1)*sub)   (masked)
    rect:  rows [(j+1)*sub, S)      x cols [j*sub, (j+1)*sub)   (no mask)

Every fully-valid element lands in exactly one tall unmasked rectangle —
the geometry the non-causal kernel already proves runs at 85% of roofline —
and the only overscheduled work is the half-empty leaf diagonals:

    scheduled/valid = 1 / (1 + sub/S)          (0.941 at sub=128, S=2048)

against 1/(1 + block_q_head/S) = 0.80 for the work-list kernel's measured
optimum. There is no cross-pass LSE merge (the decomposition the round-2
verdict sketched as two kernels + merge): all chunks update the same
(m, l, acc) scratch, so the online-softmax combine is the ordinary running
update, and init/epilogue run once per (batch, kv head) — the X factor's
per-item overhead amortizes over the whole triangle.

The per-head dots of one chunk are mutually independent (disjoint row
slices), so Mosaic can overlap one head's VPU softmax chain with another
head's MXU matmuls — the same ILP the kv_splits sub-tiling buys the
work-list kernel, here for free from the GQA group.

Quantized K/V (int8 / fp8-e4m3) dequantize ONCE into VMEM scratch at the
top of the step (the whole sequence is resident), instead of once per
(work item, sub-tile) — per-token scales still fold into the score/p
tiles on the cheap lane-oriented side.

Reference analog: the flagship CUDA kernel's causal block-range clamp +
intra-block mask (flash_attention_cutlass/csrc/flash_attention.cu:536-540,
:576-578) schedules at kBlockM=64 granularity; this kernel schedules the
triangle at `sub`-column granularity with whole-sequence row folds, which
has no CUDA counterpart (it needs the whole problem VMEM-resident — a TPU
affordance).

Scope: causal, q_len == kv_len, no window / segments (those stay on the
work-list kernel, whose pruned grids are the right tool there). Shapes
that exceed the VMEM budget fall back automatically.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_flash_attention_tpu.ops.configs import LANES

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)

# VMEM budget gate for the one-shot step (bytes). v5e has 128 MiB physical;
# leave headroom for double-buffered input/output blocks and dot temps.
_VMEM_BUDGET = 72 * 2**20


def tri_eligible(q_shape, hkv: int, kv_len: int, causal: bool, window,
                 segment_ids, segment_starts, dtype,
                 quantized: bool = False) -> bool:
    """True when the one-shot triangle kernel covers this problem."""
    bs, hq, q_len, d = q_shape
    if not causal or window is not None or segment_ids is not None \
            or segment_starts is not None:
        return False
    if q_len != kv_len or q_len < 1024:
        # below ~1k the work-list / XLA paths win; decode shapes
        # (q_len != kv_len) keep the work-list kernel's offset logic
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    est = _vmem_estimate(q_shape, hkv, dtype)
    if quantized:
        est += 2 * _round_up(q_len, LANES) * _round_up(d, LANES) * \
            jnp.dtype(dtype).itemsize
    return est <= _VMEM_BUDGET


def _vmem_estimate(q_shape, hkv: int, dtype) -> int:
    bs, hq, q_len, d = q_shape
    d_pad = _round_up(d, LANES)
    s_pad = _round_up(q_len, LANES)
    rows = (hq // hkv) * s_pad  # the GQA group folded into one grid step
    item = jnp.dtype(dtype).itemsize
    q_b = rows * d_pad * item
    kv_b = 2 * s_pad * d_pad * item
    o_b = rows * d_pad * item
    acc_b = rows * d_pad * 4
    stats_b = 2 * rows * LANES * 4
    # double-buffered ins/outs + in-flight loop-body temps: the tall-rect
    # emission holds ~3 full-height f32 tiles live per chunk (scores,
    # exp2, p) — undercounting this term let (group * s_pad) = 16k-row
    # problems through the gate and OOM at compile (run_all round 4)
    return 2 * (q_b + kv_b + o_b) + acc_b + stats_b + 3 * rows * 256 * 4


def _tri_kernel(q_ref, k_ref, v_ref, *refs, sm_scale: float, group: int,
                s_len: int, s_pad: int, sub: int, leaf: int,
                quantized: bool):
    refs = list(refs)
    kscale_ref = vscale_ref = None
    if quantized:
        kscale_ref, vscale_ref = refs[:2]
        del refs[:2]
    o_ref, lse_ref, m_scr, l_scr, acc_scr, *quant_scr = refs
    d_pad = q_ref.shape[-1]
    d_rep = d_pad // LANES
    n_chunks = s_pad // sub
    dtype = q_ref.dtype
    precision = (jax.lax.Precision.HIGHEST
                 if dtype == jnp.float32 else None)

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # scale * log2(e) folded into q once: (rows, d) multiply, every exp
    # downstream is a raw exp2 (triton tiny_flash_attn_triton.py:133 trick)
    q = q_ref[0].reshape(group * s_pad, d_pad)
    q = (q * jnp.asarray(sm_scale * _LOG2E, dtype)).astype(dtype)

    if quantized:
        # whole-sequence dequant, once per (batch, kv head) — the chunks
        # below read the converted scratch
        from tiny_flash_attention_tpu.ops.flash import _payload_to_compute
        kc_scr, vc_scr = quant_scr
        kc_scr[...] = _payload_to_compute(k_ref[0, 0], dtype)
        vc_scr[...] = _payload_to_compute(v_ref[0, 0], dtype)

        def kv_chunk(j):
            sl = slice(j * sub, (j + 1) * sub)
            return kc_scr[sl, :], vc_scr[sl, :]
    else:
        def kv_chunk(j):
            sl = slice(j * sub, (j + 1) * sub)
            return k_ref[0, 0, sl, :], v_ref[0, 0, sl, :]

    def update(g, r0, r1, s_tile, v_tile, vs_cols):
        """Online-softmax update of head g's rows [r0, r1) with the f32
        score tile s_tile (already scaled by K scales when quantized)
        against the kv columns whose V rows are v_tile / V scales vs_cols
        (flash.py inner-loop idioms: LANES-wide stats, reduction results
        stay lane-replicated, widening via jnp.tile — see the layout note
        at flash.py:306-312)."""
        base = g * s_pad
        rs = slice(base + r0, base + r1)
        cols = s_tile.shape[1]
        m_prev = m_scr[rs, :]
        l_prev = l_scr[rs, :]
        m_cur = jnp.max(s_tile, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s_tile - jnp.tile(m_next, (1, cols // LANES)))
        l_scr[rs, :] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[rs, :] = m_next
        if vs_cols is not None:
            p = p * vs_cols
        pv = jax.lax.dot_general(
            p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc_scr[rs, :] = (acc_scr[rs, :] * jnp.tile(alpha, (1, d_rep))
                          + pv)

    def chunk_thunks(j):
        """Emit chunk j's score tiles as DEFERRED thunks (each runs the
        MXU dot + masking, and reads nothing from the stats scratch).
        Keeping the dots dependence-free of (m, l, acc) lets the driver
        loop below issue tile i+1's matmul ahead of tile i's softmax
        chain — the software pipeline that hides the VPU stats recurrence
        behind the MXU (the cross-chunk analog of the reference kernel's
        async-load-next-K-during-gemm discipline, flash_attention_cutlass/
        csrc/flash_attention.cu:585-590)."""
        c0 = j * sub
        thunks = []

        def scaled_dot(qs, k_t, width):
            s = jax.lax.dot_general(
                qs, k_t[:width] if width < sub else k_t,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            if quantized:
                s = s * kscale_ref[0, 0, :, c0:c0 + width]
            return s

        def vs_at(width):
            if not quantized:
                return None
            return vscale_ref[0, 0, :, c0:c0 + width]

        # --- the chunk's own sub x sub diagonal square, emitted at LEAF
        # granularity: per leaf row-band t, ONE fused tile over cols
        # [0, (t+1)*leaf) — the strip left of the band is strictly valid
        # (col < t*leaf <= row) and the trailing leaf x leaf block carries
        # the diagonal mask, so each band costs one dot + one stats/acc
        # update (the round-3 split emission paid two of each, which made
        # leaf=128 measure BELOW leaf=256 despite its better
        # sched = 1/(1+leaf/S)). Overscheduled MXU work stays leaf/2 per
        # row while the tall rects keep their full `sub` width.
        for t in range(sub // leaf):
            l0 = c0 + t * leaf          # this band's first row/col
            width = (t + 1) * leaf
            ci_w = jax.lax.broadcasted_iota(jnp.int32, (leaf, width), 1)
            ri_w = jax.lax.broadcasted_iota(jnp.int32, (leaf, width), 0)
            valid = ci_w <= ri_w + t * leaf
            if l0 + leaf > s_len:
                # partial tail: also mask kv padding columns
                valid = valid & (ci_w < s_len - c0)

            def leaf_tile(g, l0=l0, width=width, valid=valid):
                k_t, v_t = kv_chunk(j)
                qs = q[g * s_pad + l0:g * s_pad + l0 + leaf, :]
                sl = jnp.where(valid, scaled_dot(qs, k_t, width),
                               DEFAULT_MASK_VALUE)
                return (g, l0, l0 + leaf, sl, v_t[:width], vs_at(width))

            thunks += [functools.partial(leaf_tile, g)
                       for g in range(group)]
        # --- tall unmasked rectangle: rows [c0+sub, s_pad) see every
        # column of this chunk (fully-valid by construction)
        r0 = c0 + sub
        if r0 < s_pad:
            def rect_tile(g):
                k_t, v_t = kv_chunk(j)
                qs = q[g * s_pad + r0:(g + 1) * s_pad, :]
                return (g, r0, s_pad, scaled_dot(qs, k_t, sub), v_t,
                        vs_at(sub))

            thunks += [functools.partial(rect_tile, g)
                       for g in range(group)]
        return thunks

    # In-order emission: each tile's update follows its dot directly.
    # Explicit software pipelines were MEASURED NEGATIVE on v5e (r5):
    # one-chunk-ahead batched dots 118.3 TF/s, depth-1 tile lookahead
    # 120.8, vs 132.0 for this order — Mosaic's scheduler already
    # overlaps the independent per-head dots with the stats chain, and
    # widening the reorder window only added live-range pressure.
    for j in range(n_chunks):
        for th in chunk_thunks(j):
            update(*th())

    # --- epilogue: single init/epilogue per (batch, kv head) ---------------
    l_f = l_scr[...]
    l_safe = jnp.where((l_f == 0.0) | jnp.isnan(l_f), 1.0, l_f)
    acc = acc_scr[...] / jnp.tile(l_safe, (1, d_rep))
    o_ref[0] = acc.astype(o_ref.dtype).reshape(o_ref.shape[1:])
    m_f = m_scr[...]
    lse = m_f[:, :1] * _LN2 + jnp.log(l_safe[:, :1])
    lse_ref[0] = lse.astype(lse_ref.dtype).reshape(lse_ref.shape[1:])


def tri_flash_fwd(q, k, v, *, sm_scale: float, sub: int = 256,
                  leaf: int = None,
                  k_scales=None, v_scales=None, interpret: bool = False):
    """Causal flash-attention forward via triangle decomposition.

    Args mirror ops.flash._flash_fwd_impl's core surface: q (b, hq, S, d),
    k/v (b, hkv, S, d) (optionally int8/fp8 payloads with k_scales/
    v_scales (b, hkv, S, 1)). Returns (out, lse) with out sliced to the
    input shape and lse (b, hq, S) float32 natural-log.
    """
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, dk = k.shape
    assert q_len == kv_len and dk == d and v.shape == k.shape
    group = hq // hkv
    quantized = k_scales is not None
    sub = max(LANES, _round_up(sub, LANES))
    leaf = sub if leaf is None else max(LANES, _round_up(leaf, LANES))
    while sub % leaf:
        leaf //= 2
    leaf = max(leaf, LANES)
    d_pad = _round_up(d, LANES)
    s_pad = _round_up(q_len, sub)
    rows = group * s_pad

    q = _pad4(q, s_pad, d_pad)
    k = _pad4(k, s_pad, d_pad)
    v = _pad4(v, s_pad, d_pad)

    kernel = functools.partial(
        _tri_kernel, sm_scale=sm_scale, group=group, s_len=q_len,
        s_pad=s_pad, sub=sub, leaf=leaf, quantized=quantized)

    in_specs = [
        pl.BlockSpec((1, group, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
    ]
    operands = [q, k, v]
    if quantized:
        ks = jnp.swapaxes(k_scales, 2, 3)
        vs = jnp.swapaxes(v_scales, 2, 3)
        if ks.shape[3] != s_pad:
            pad = ((0, 0), (0, 0), (0, 0), (0, s_pad - ks.shape[3]))
            ks, vs = jnp.pad(ks, pad), jnp.pad(vs, pad)
        operands += [ks, vs]
        in_specs += [
            pl.BlockSpec((1, 1, 1, s_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, s_pad), lambda b, h: (b, h, 0, 0)),
        ]

    compute_dtype = q.dtype
    scratch = [
        pltpu.VMEM((rows, LANES), jnp.float32),   # running max m (log2)
        pltpu.VMEM((rows, LANES), jnp.float32),   # running sum l
        pltpu.VMEM((rows, d_pad), jnp.float32),   # output accumulator
    ]
    if quantized:
        scratch += [pltpu.VMEM((s_pad, d_pad), compute_dtype)] * 2

    cost = pl.CostEstimate(
        flops=int(4 * bs * hq * q_len * kv_len * d * 0.5),
        bytes_accessed=int((2 * q.size + k.size + v.size)
                           * q.dtype.itemsize),
        transcendentals=int(bs * hq * q_len * kv_len * 0.5),
    )

    out, lse = pl.pallas_call(
        kernel,
        grid=(bs, hkv),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, group, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, group, s_pad, 1), lambda b, h: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, hq, s_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, hq, s_pad, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)

    return out[:, :, :q_len, :d], lse[:, :, :q_len, 0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad4(x, s_to: int, d_to: int):
    ps, pd = s_to - x.shape[2], d_to - x.shape[3]
    if ps == 0 and pd == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, ps), (0, pd)))


# ---------------------------------------------------------------------------
# Q-banded triangle kernel: the same column-sweep decomposition, gridded
# over row bands so sequences whose one-shot working set exceeds VMEM
# (s >= ~8k at GQA-4 d128 bf16) keep the rect geometry. Band i (rows
# [i*B, (i+1)*B)) holds its q/acc/stats plus the WHOLE K/V in VMEM:
#
#   rect phase: fori_loop over the i*B/sub chunks left of the band —
#     every score is valid (rows >= band start > any chunk column), so
#     these dots run the unmasked non-causal geometry;
#   diag phase: the band's own B x B triangle via the static leaf sweep
#     (identical structure to the one-shot kernel's per-chunk emission).
#
# The folded rows per grid step (group * B) stay at the measured optimum
# (~8192) regardless of S, while K/V VMEM grows only linearly (4 MB at
# s8k bf16 d128). The rect chunk count depends on the band index — a
# dynamic trip count, which is exactly what lax.fori_loop under Pallas
# ("arbitrary"-free, all-parallel grid) expresses.
# ---------------------------------------------------------------------------

# Folded-row budget per band step: group * band_rows ~ this. Matches the
# non-causal dispatch's measured 8192-row optimum (configs.py).
_BAND_ROW_BUDGET = 8192


def tri_block_eligible(q_shape, hkv: int, kv_len: int, causal: bool, window,
                       segment_ids, segment_starts, dtype,
                       sub: int = 256, quantized: bool = False) -> bool:
    """True when the banded triangle kernel covers this problem.

    Sliding windows ARE covered (unlike the one-shot kernel): the band
    height shrinks to <= window so the band's own triangle stays fully
    inside the window, and the rect phase clips + edge-masks the chunks
    at the window's left boundary. Windows narrower than one chunk stay
    on the work-list grid (its banded work list is the right tool there).
    """
    bs, hq, q_len, d = q_shape
    if not causal or segment_ids is not None or segment_starts is not None:
        return False
    if q_len != kv_len or q_len < 1024:
        return False
    if window is not None and window < sub:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    est = _block_vmem_estimate(q_shape, hkv, dtype)
    if quantized:
        # whole-sequence dequant scratch (k + v in compute dtype)
        d_pad = _round_up(d, LANES)
        est += 2 * _round_up(q_len, LANES) * d_pad * \
            jnp.dtype(dtype).itemsize
    return est <= _VMEM_BUDGET


def _block_vmem_estimate(q_shape, hkv: int, dtype) -> int:
    bs, hq, q_len, d = q_shape
    d_pad = _round_up(d, LANES)
    group = hq // hkv
    band = max(LANES, _round_up(_BAND_ROW_BUDGET // group, LANES))
    s_pad = _round_up(q_len, band)
    rows = group * band
    item = jnp.dtype(dtype).itemsize
    q_b = rows * d_pad * item
    kv_b = 2 * s_pad * d_pad * item          # whole sequence, per step
    o_b = rows * d_pad * item
    acc_b = rows * d_pad * 4
    stats_b = 2 * rows * LANES * 4
    # in-flight temps term matches _vmem_estimate's accounting
    return 2 * (q_b + kv_b + o_b) + acc_b + stats_b + 3 * rows * 256 * 4


def _tri_block_kernel(q_ref, k_ref, v_ref, *refs, sm_scale: float,
                      group: int, s_len: int, s_pad: int, band: int,
                      sub: int, leaf: int, quantized: bool,
                      window=None):
    refs = list(refs)
    kscale_ref = vscale_ref = None
    if quantized:
        kscale_ref, vscale_ref = refs[:2]
        del refs[:2]
    o_ref, lse_ref, m_scr, l_scr, acc_scr, *quant_scr = refs
    d_pad = q_ref.shape[-1]
    d_rep = d_pad // LANES
    dtype = q_ref.dtype
    precision = (jax.lax.Precision.HIGHEST
                 if dtype == jnp.float32 else None)
    i = pl.program_id(2)                     # band index
    band0 = i * band                          # first global row of the band

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].reshape(group * band, d_pad)
    q = (q * jnp.asarray(sm_scale * _LOG2E, dtype)).astype(dtype)

    if quantized:
        from tiny_flash_attention_tpu.ops.flash import _payload_to_compute
        kc_scr, vc_scr = quant_scr
        kc_scr[...] = _payload_to_compute(k_ref[0, 0], dtype)
        vc_scr[...] = _payload_to_compute(v_ref[0, 0], dtype)

        def kv_at(c0, width):
            return (kc_scr[pl.ds(c0, width), :], vc_scr[pl.ds(c0, width), :])
    else:
        def kv_at(c0, width):
            return (k_ref[0, 0, pl.ds(c0, width), :],
                    v_ref[0, 0, pl.ds(c0, width), :])

    def update(g, r0, r1, s_tile, c0, v_tile):
        """Online-softmax update of head g's band rows [r0, r1) (band-
        local) against kv columns [c0, c0 + s_tile.shape[1]) (global,
        possibly traced). Same lane-layout idioms as the one-shot kernel."""
        base = g * band
        rs = slice(base + r0, base + r1)
        cols = s_tile.shape[1]
        if quantized:
            s_tile = s_tile * kscale_ref[0, 0, :, pl.ds(c0, cols)]
        m_prev = m_scr[rs, :]
        l_prev = l_scr[rs, :]
        m_cur = jnp.max(s_tile, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s_tile - jnp.tile(m_next, (1, cols // LANES)))
        l_scr[rs, :] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[rs, :] = m_next
        if quantized:
            p = p * vscale_ref[0, 0, :, pl.ds(c0, cols)]
        pv = jax.lax.dot_general(
            p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc_scr[rs, :] = (acc_scr[rs, :] * jnp.tile(alpha, (1, d_rep))
                          + pv)

    # --- rect phase: chunks strictly left of the band ---------------------
    # causal-only: all of them, unmasked. With a sliding window, a chunk
    # is fully valid iff its columns are inside EVERY band row's window
    # (c0 >= band0 + band - window); chunks straddling the window's left
    # edge get a banded mask (col > row - window), and chunks entirely
    # left of any row's window are never scheduled.
    n_left = band0 // sub

    def rect_body(j, _):
        k_t, v_t = kv_at(j * sub, sub)
        for g in range(group):
            qs = q[g * band:(g + 1) * band, :]
            s = jax.lax.dot_general(
                qs, k_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            update(g, 0, band, s, j * sub, v_t)
        return 0

    if window is None:
        jax.lax.fori_loop(0, n_left, rect_body, 0)
    else:
        lo_full = jnp.clip(-(-(band0 + band - window) // sub), 0, n_left)
        lo_any = jnp.clip((band0 - window) // sub, 0, n_left)
        rr = jax.lax.broadcasted_iota(jnp.int32, (band, sub), 0) + band0

        def edge_body(j, _):
            k_t, v_t = kv_at(j * sub, sub)
            cc = jax.lax.broadcasted_iota(jnp.int32, (band, sub), 1) \
                + j * sub
            valid = cc > rr - window
            for g in range(group):
                qs = q[g * band:(g + 1) * band, :]
                s = jax.lax.dot_general(
                    qs, k_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
                update(g, 0, band, s, j * sub, v_t)
            return 0

        jax.lax.fori_loop(lo_any, lo_full, edge_body, 0)
        jax.lax.fori_loop(lo_full, n_left, rect_body, 0)

    # --- diag phase: the band's own triangle, leaf column sweep. Same
    # fused emission as the one-shot kernel: per leaf row-band, one tile
    # over cols [0, (t+1)*leaf) whose strip part is strictly valid and
    # whose trailing leaf x leaf block carries the diagonal mask — one
    # dot + one stats/acc update per band.
    for jj in range(band // sub):
        c0l = jj * sub                         # band-local chunk start
        k_t, v_t = kv_at(band0 + c0l, sub)
        for t in range(sub // leaf):
            l0 = c0l + t * leaf                # band-local leaf row/col
            width = (t + 1) * leaf
            ci_w = jax.lax.broadcasted_iota(jnp.int32, (leaf, width), 1)
            ri_w = jax.lax.broadcasted_iota(jnp.int32, (leaf, width), 0)
            valid = (ci_w <= ri_w + t * leaf) \
                & (ci_w < s_len - band0 - c0l)
            for g in range(group):
                qs = q[g * band + l0:g * band + l0 + leaf, :]
                sl = jax.lax.dot_general(
                    qs, k_t[:width], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                sl = jnp.where(valid, sl, DEFAULT_MASK_VALUE)
                update(g, l0, l0 + leaf, sl, band0 + c0l, v_t[:width])
        r0 = c0l + sub
        if r0 < band:
            for g in range(group):
                qs = q[g * band + r0:(g + 1) * band, :]
                s = jax.lax.dot_general(
                    qs, k_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                update(g, r0, band, s, band0 + c0l, v_t)

    l_f = l_scr[...]
    l_safe = jnp.where((l_f == 0.0) | jnp.isnan(l_f), 1.0, l_f)
    acc = acc_scr[...] / jnp.tile(l_safe, (1, d_rep))
    o_ref[0] = acc.astype(o_ref.dtype).reshape(o_ref.shape[1:])
    m_f = m_scr[...]
    lse = m_f[:, :1] * _LN2 + jnp.log(l_safe[:, :1])
    lse_ref[0] = lse.astype(lse_ref.dtype).reshape(lse_ref.shape[1:])


def tri_block_fwd(q, k, v, *, sm_scale: float, sub: int = 256,
                  leaf: int = None, window=None, k_scales=None,
                  v_scales=None, interpret: bool = False):
    """Causal flash-attention forward via the q-banded triangle sweep.

    Same surface as tri_flash_fwd plus sliding `window` (>= sub); use for
    sequences whose one-shot working set exceeds VMEM. Returns (out, lse).
    """
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, dk = k.shape
    assert q_len == kv_len and dk == d and v.shape == k.shape
    group = hq // hkv
    quantized = k_scales is not None
    sub = max(LANES, _round_up(sub, LANES))
    leaf = sub if leaf is None else max(LANES, _round_up(leaf, LANES))
    while sub % leaf:
        leaf //= 2
    leaf = max(leaf, LANES)
    band = max(sub, _round_up(_BAND_ROW_BUDGET // group, sub))
    if window is not None:
        # the band's own triangle must sit fully inside the window
        # (within-band row-col distance <= band - 1), so band <= window
        assert window >= sub, (window, sub)
        band = min(band, window // sub * sub)
    d_pad = _round_up(d, LANES)
    s_pad = _round_up(q_len, band)
    n_bands = s_pad // band
    rows = group * band

    q = _pad4(q, s_pad, d_pad)
    k = _pad4(k, s_pad, d_pad)
    v = _pad4(v, s_pad, d_pad)

    kernel = functools.partial(
        _tri_block_kernel, sm_scale=sm_scale, group=group, s_len=q_len,
        s_pad=s_pad, band=band, sub=sub, leaf=leaf, quantized=quantized,
        window=window)

    in_specs = [
        pl.BlockSpec((1, group, band, d_pad), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, i: (b, h, 0, 0)),
    ]
    operands = [q, k, v]
    if quantized:
        ks = jnp.swapaxes(k_scales, 2, 3)
        vs = jnp.swapaxes(v_scales, 2, 3)
        if ks.shape[3] != s_pad:
            pad = ((0, 0), (0, 0), (0, 0), (0, s_pad - ks.shape[3]))
            ks, vs = jnp.pad(ks, pad), jnp.pad(vs, pad)
        operands += [ks, vs]
        in_specs += [
            pl.BlockSpec((1, 1, 1, s_pad), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, s_pad), lambda b, h, i: (b, h, 0, 0)),
        ]

    compute_dtype = q.dtype
    scratch = [
        pltpu.VMEM((rows, LANES), jnp.float32),
        pltpu.VMEM((rows, LANES), jnp.float32),
        pltpu.VMEM((rows, d_pad), jnp.float32),
    ]
    if quantized:
        scratch += [pltpu.VMEM((s_pad, d_pad), compute_dtype)] * 2

    cost = pl.CostEstimate(
        flops=int(4 * bs * hq * q_len * kv_len * d * 0.5),
        bytes_accessed=int((2 * q.size + n_bands * (k.size + v.size))
                           * q.dtype.itemsize),
        transcendentals=int(bs * hq * q_len * kv_len * 0.5),
    )

    out, lse = pl.pallas_call(
        kernel,
        grid=(bs, hkv, n_bands),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, group, band, d_pad),
                         lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, group, band, 1), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, hq, s_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, hq, s_pad, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)

    return out[:, :, :q_len, :d], lse[:, :, :q_len, 0]
