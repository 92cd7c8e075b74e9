"""Row-loop flash-attention forward: dynamic KV bounds, zero dead tiles.

Second-generation causal forward (round 2). The work-list kernel
(ops/flash.py) schedules one grid step per (q_block, kv_block) tile, so
causal efficiency is capped by tile quantization — with the tuned
(2048, 512) geometry the scheduled/valid ratio is 0.80 and measured causal
throughput is 0.73x non-causal. This kernel moves the KV walk INSIDE the
grid step:

    grid = (batch, kv_heads, n_q_blocks)        # one step per q row-block
    per step: lax.fori_loop over 256-wide KV chunks with a DYNAMIC
    trip count = ceil(visible_cols / chunk)     # quantization at 256, not
                                                # block_kv granularity

TPU specifics that make this fast:
  * K/V stream HBM->VMEM with MANUAL double-buffered async copies (the
    cp.async discipline of the reference, cutlass flash_attention.cu:549-606,
    expressed as pltpu.make_async_copy on alternating buffer slots — same
    pattern as the paged decode kernel, ops/paged.py).
  * The visible range splits into [interior chunks | straddle chunks]; two
    fori_loops share one loop body parameterized by a STATIC masked flag, so
    interior chunks run the pure dot-softmax-dot pipeline and only the
    O(block_q) straddle columns pay the mask compare+select.
  * Per-row work (q load + prescale, stats init, epilogue normalize + store)
    runs once per ROW instead of once per TILE — the work-list kernel's
    measured ~9% causal-side per-tile overhead amortizes away.
  * The loop body unrolls `unroll` sub-tiles per chunk so sub-tile i+1's QK
    matmul overlaps sub-tile i's VPU softmax (the kv_splits trick).

Supports causal + non-causal, GQA folding, decode shapes (q_len != kv_len),
sliding windows, and fp32/bf16. Packed segments stay on the work-list kernel
(they need per-token ids, which fit its BlockSpec pipeline better).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_flash_attention_tpu.ops.configs import FlashConfig, LANES

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)


def _rowloop_kernel(
    q_ref, k_hbm, v_hbm, *refs,
    causal: bool,
    sm_scale: float,
    block_q: int,
    chunk: int,
    unroll: int,
    group: int,
    q_len: int,
    kv_len: int,
    window,
    single_loop: bool,
    jagged: bool = False,
):
    refs = list(refs)
    len_ref = None
    if jagged:
        len_ref = refs.pop(0)
    (o_ref, lse_ref, k_buf, v_buf, k_sems, v_sems, m_scr, l_scr, acc_scr,
     diff_scr, rmod_scr) = refs
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    rows = group * block_q
    offset = kv_len - q_len
    sub = chunk // unroll
    d_rep = acc_scr.shape[-1] // LANES

    # --- visible-chunk bounds (dynamic, from the grid's qi scalar; with
    # jagged lengths additionally clamped by THIS row's sequence length —
    # each batch row is an independent causal problem of its own length,
    # so a short request in a long-padded batch costs ~L^2/2, not
    # L_max^2/2) -----------------------------------------------------------
    first_pos = qi * block_q + offset            # first row's position
    last_pos = first_pos + block_q - 1           # last row's position
    n_kv_chunks = pl.cdiv(kv_len, chunk)         # static-shaped scalar
    L = len_ref[b] if jagged else None
    if causal:
        eff_last = last_pos if not jagged else jnp.minimum(last_pos, L - 1)
        hi = jnp.clip(eff_last // chunk + 1, 1, n_kv_chunks)
        # interior = fully valid for EVERY row (col limit = first row's)
        eff_first = (first_pos if not jagged
                     else jnp.minimum(first_pos, L - 1))
        n_int = jnp.clip((eff_first + 1) // chunk, 0, hi)
    else:
        hi = n_kv_chunks
        n_int = jnp.asarray(kv_len // chunk, jnp.int32)
    lo = jnp.asarray(0, jnp.int32)
    if window is not None:
        lo = jnp.clip((first_pos - window + 1) // chunk, 0, hi)
        # left-fully-valid once col0 >= last row's left edge
        li = jnp.clip(
            (last_pos - window + chunk) // chunk, lo, hi)
    else:
        li = lo
    # three contiguous ranges: [lo, mid_lo) masked, [mid_lo, mid_hi)
    # interior, [mid_hi, hi) masked
    mid_lo = jnp.minimum(li, hi)
    mid_hi = jnp.clip(n_int, mid_lo, hi)

    # --- mask geometry tables (built at qi == 0 for EVERY (b, h): b/h are
    # 'parallel' dims, so on megacore TPUs (v4/v5p) the grid can split
    # across cores and a core whose slice excludes (b=0, h=0) would never
    # run a (0, 0, *) step — guarding on b/h would leave its tables
    # uninitialized. qi is the sequential 'arbitrary' dim, so qi == 0 runs
    # on every core before any qi > 0 step of the same (b, h); the rebuild
    # per (b, h) is two iota passes, negligible. ---------------------------
    needs_mask = causal or window is not None or kv_len % chunk or jagged
    if needs_mask:
        @pl.when(qi == 0)
        def _tables():
            ci = jax.lax.broadcasted_iota(jnp.int32, (rows, chunk), 1)
            r = jax.lax.broadcasted_iota(jnp.int32, (rows, chunk), 0)
            diff_scr[...] = ci - (r % block_q)
            rr = jax.lax.broadcasted_iota(jnp.int32, rmod_scr.shape, 0)
            rmod_scr[...] = rr % block_q

    # --- per-row setup ----------------------------------------------------
    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    q = q_ref[0].reshape(rows, q_ref.shape[-1])
    q = (q * jnp.asarray(sm_scale * _LOG2E, q.dtype)).astype(q.dtype)
    precision = (jax.lax.Precision.HIGHEST
                 if q_ref.dtype == jnp.float32 else None)

    def copy(j, slot):
        jc = jnp.clip(j, 0, n_kv_chunks - 1) * chunk
        ck = pltpu.make_async_copy(
            k_hbm.at[b, h, pl.ds(jc, chunk), :], k_buf.at[slot],
            k_sems.at[slot])
        cv = pltpu.make_async_copy(
            v_hbm.at[b, h, pl.ds(jc, chunk), :], v_buf.at[slot],
            v_sems.at[slot])
        return ck, cv

    def start(j, slot):
        ck, cv = copy(j, slot)
        ck.start()
        cv.start()

    start(lo, lo % 2)

    def body(j, masked):
        slot = j % 2
        ck, cv = copy(j, slot)

        @pl.when(j + 1 < hi)
        def _prefetch():
            start(j + 1, 1 - slot)

        ck.wait()
        k_full = k_buf[slot].astype(q.dtype)
        cv.wait()
        v_full = v_buf[slot].astype(q.dtype)
        for si in range(unroll):
            kk = k_full[si * sub:(si + 1) * sub]
            s = jax.lax.dot_general(
                q, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            if masked:
                # diff slice values = (col within CHUNK) - (row position
                # within head) — the si*sub offset is inside the slice, so
                # thresholds subtract only the chunk base j*chunk
                col0 = j * chunk
                diff = diff_scr[:, si * sub:(si + 1) * sub]
                if causal:
                    valid = diff <= (qi * block_q + offset - col0)
                else:
                    valid = None
                if window is not None:
                    wv = diff >= (qi * block_q + offset - window + 1 - col0)
                    valid = wv if valid is None else valid & wv
                # kv tail padding: global col < kv_len
                if kv_len % chunk:
                    pv_ok = (diff + jnp.tile(rmod_scr[...],
                                             (1, sub // LANES))
                             < kv_len - col0)
                    valid = pv_ok if valid is None else valid & pv_ok
                if jagged:
                    # per-request length: global col < L (rows past L are
                    # pad; their garbage output is sliced per request)
                    lv_ok = (diff + jnp.tile(rmod_scr[...],
                                             (1, sub // LANES))
                             < L - col0)
                    valid = lv_ok if valid is None else valid & lv_ok
                if valid is not None:
                    s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - jnp.tile(m_next, (1, sub // LANES)))
            if masked and (causal and offset < 0):
                # fully-masked rows (q_len > kv_len decode shapes)
                p *= jnp.tile(m_next > 0.5 * DEFAULT_MASK_VALUE,
                              (1, sub // LANES))
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_next
            l_scr[...] = l_next
            vv = v_full[si * sub:(si + 1) * sub]
            pv = jax.lax.dot_general(
                p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            acc_scr[...] = acc_scr[...] * jnp.tile(alpha, (1, d_rep)) + pv
        return j + 1

    def masked_body(j, carry):
        body(j, True)
        return carry

    def interior_body(j, carry):
        body(j, False)
        return carry

    if single_loop:
        # one loop, every chunk masked: trades the interior chunks' mask
        # ops for two fewer loop set-ups per row
        jax.lax.fori_loop(lo, hi, masked_body, 0)
    else:
        jax.lax.fori_loop(lo, mid_lo, masked_body, 0)
        jax.lax.fori_loop(mid_lo, mid_hi, interior_body, 0)
        jax.lax.fori_loop(mid_hi, hi, masked_body, 0)

    l = l_scr[...]
    l_safe = jnp.where((l == 0.0) | jnp.isnan(l), 1.0, l)
    o_ref[0] = (acc_scr[...] / jnp.tile(l_safe, (1, d_rep))).astype(
        o_ref.dtype).reshape(o_ref.shape[1:])
    lse_ref[0] = (m_scr[:, :1] * _LN2 + jnp.log(l_safe[:, :1])).astype(
        lse_ref.dtype).reshape(lse_ref.shape[1:])


def flash_attention_rowloop(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Optional[int] = None,
    seq_lengths: Optional[jax.Array] = None,
    config: Optional[FlashConfig] = None,
    chunk: int = 256,
    unroll: int = 2,
    single_loop: bool = False,
    interpret: Optional[bool] = None,
):
    """Row-loop forward; returns (out, lse). Same semantics as
    ops/flash.flash_attention minus segment_ids.

    seq_lengths: optional (batch,) int32 RUNTIME per-request lengths for
    JAGGED batches (causal, q_len == kv_len): row b attends only its first
    seq_lengths[b] tokens and the dynamic KV trip count clamps to them, so
    a heterogeneous admission batch costs ~sum(L_i^2)/2 at 256-column
    granularity — without packing into one row (no segment ids, and ONE
    compiled executable per padded bucket instead of one per packing
    pattern; cf. engine.add_requests_packed's compile-cost note). Rows at
    positions >= seq_lengths[b] produce garbage output the caller slices
    off per request.
    """
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, dk = k.shape
    assert dk == d and v.shape == k.shape
    assert hq % hkv == 0
    group = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if window is not None:
        assert causal, "sliding window requires causal=True"
        window = int(window)
    jagged = seq_lengths is not None
    if jagged:
        assert causal and q_len == kv_len and window is None, (
            "seq_lengths = jagged causal prefill (q_len == kv_len)")
        seq_lengths = jnp.asarray(seq_lengths, jnp.int32)
        assert seq_lengths.shape == (bs,), seq_lengths.shape
    if interpret is None:
        interpret = (config.interpret if config is not None
                     else jax.default_backend() != "tpu")
    block_q_folded = config.block_q if config is not None else 2048
    block_q = max(LANES, _round_up(block_q_folded // group, LANES))
    block_q = min(block_q, _round_up(q_len, LANES))
    rows = group * block_q

    d_pad = _round_up(d, LANES)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, chunk)
    n_q = q_pad // block_q

    qp = _pad4(q, q_pad, d_pad)
    kp = _pad4(k, kv_pad, d_pad)
    vp = _pad4(v, kv_pad, d_pad)

    sub = chunk // unroll
    assert sub % LANES == 0, (chunk, unroll)

    kernel = functools.partial(
        _rowloop_kernel, causal=causal, sm_scale=sm_scale, block_q=block_q,
        chunk=chunk, unroll=unroll, group=group, q_len=q_len, kv_len=kv_len,
        window=window, single_loop=single_loop, jagged=jagged)

    flops_mask = 0.5 if causal else 1.0
    cost = pl.CostEstimate(
        flops=int(4 * bs * hq * q_len * kv_len * d * flops_mask),
        bytes_accessed=int((2 * qp.size + kp.size + vp.size)
                           * q.dtype.itemsize),
        transcendentals=int(bs * hq * q_len * kv_len * flops_mask),
    )

    in_specs = [
        pl.BlockSpec((1, group, block_q, d_pad),
                     lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [qp, kp, vp]
    if jagged:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(seq_lengths)

    out, lse = pl.pallas_call(
        kernel,
        grid=(bs, hkv, n_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, group, block_q, d_pad),
                         lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, group, block_q, 1),
                         lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, hq, q_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, hq, q_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d_pad), kp.dtype),    # K double buffer
            pltpu.VMEM((2, chunk, d_pad), vp.dtype),    # V double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((rows, LANES), jnp.float32),     # running max m
            pltpu.VMEM((rows, LANES), jnp.float32),     # running sum l
            pltpu.VMEM((rows, d_pad), jnp.float32),     # output accumulator
            pltpu.VMEM((rows, chunk), jnp.int32),       # mask diff table
            pltpu.VMEM((rows, LANES), jnp.int32),       # r % block_q
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 2**20),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)

    return out[:, :, :q_len, :d], lse[:, :, :q_len, 0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad4(x: jax.Array, s_to: int, d_to: int):
    ps, pd = s_to - x.shape[2], d_to - x.shape[3]
    if ps == 0 and pd == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, ps), (0, pd)))
