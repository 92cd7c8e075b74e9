"""One-shot triangle-decomposition BACKWARD: dq + dk + dv in one kernel.

The round-3 forward (ops/flash_tri.py) showed that holding the whole
causal problem in VMEM per (batch, kv head) and emitting the triangle as
unmasked rectangles + leaf diagonals beats tiled grids (sched
1/(1+leaf/S) vs 0.80, one init/epilogue). The backward benefits MORE:

  * the work-list backward runs TWO kernels (dq row-parallel, dkv
    column-parallel), each recomputing p from (q, k, lse). Here dq_acc,
    dk_acc and dv_acc all live in VMEM scratch at once, so each emitted
    block computes p and ds ONCE and feeds all three accumulators —
    5 matmuls per block total (s, dp, dq, dk, dv), zero recompute,
    zero HBM round-trip for partial grads;
  * both kernels' scheduling waste disappears the same way the forward's
    did: every fully-valid element lands in an unmasked rect.

Math per block (rows R x cols C of the kv chunk), from the saved forward
(lse) plus the precomputed per-row delta D = rowsum(do * out) — the
standard FA2 backward identities:

    s  = q @ k^T * scale            (log2 domain for the exp)
    p  = exp2(s2 - lse2)            (s2, lse2 in the log2 domain)
    dp = do @ v^T
    ds = p * (dp - D) * scale
    dq[rows] += ds @ k
    dk[cols] += ds^T @ q
    dv[cols] += p^T @ do

STRUCTURE (differs from the forward deliberately): the forward's fully
unrolled column sweep is fine there (3 temps per block), but the backward
emits ~8 f32 temps per block and Mosaic allocates unrolled blocks'
temps as distinct VMEM buffers — the unrolled form measured 472 MiB of
VMEM at s2048 on v5e (3.7x physical). So the backward rolls the sweep
into `lax.fori_loop`s with FIXED block shapes — one loop over kv chunks
(diagonal leaves + strips) with a nested loop over the tall-rect row
tiles — and batches every dot over the whole GQA group (rows from all
`gpp` heads concatenate; dk/dv then sum over heads inside the dot's
contraction, for free). Temps live in two small loop bodies instead of
~100 unrolled blocks; the working set drops to windows + accumulators +
O(gpp * sub^2).

The backward still holds ~3x the forward's VMEM (do + three f32
accumulators), so the GQA group optionally SPLITS over a third,
sequential grid dimension: each step processes `group/splits` q heads'
rows against the full K/V while dk/dv accumulate in scratch across the
split steps (init at t == 0, write at t == splits-1). `head_splits`
picks the smallest split whose working set fits.

Scope mirrors the forward kernel: causal, q_len == kv_len, no window /
segments, bf16/fp32. Reference analog: the LSE the reference emits "for
a backward" it never built (cutlass flash_attention.cu:614-623) feeds
exactly the p-reconstruction above.
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

_VMEM_BUDGET = 56 * 2**20   # per-step working-set target (windows+scratch)


def _fori(lo, hi, body):
    """Sequential loop over [lo, hi) that STAYS a loop after lowering.

    The whole point of this file's loop structure is ONE live set of
    loop-body temps (see the STRUCTURE note in the module docstring) —
    but the current Mosaic toolchain fully unrolls loops whose trip
    count it can prove static, which resurrects the unrolled-temps form
    as 460M of register-allocator SPILL SLOTS (measured: 500.67M of
    128M VMEM at s2048 gpp=4, round 5 — the round-4 train suite
    failure). A `lax.while_loop` is NOT enough: the canonicalizer
    converts a constant-bound while back into a for and unrolls it.
    Callers must therefore pass `hi` as a RUNTIME value — both kernels
    read their trip counts from an SMEM operand (`nb_ref`), which the
    compiler cannot constant-fold. `body(i)` runs for its ref side
    effects only."""
    def cond(i):
        return i < hi

    def step(i):
        body(i)
        return i + 1

    jax.lax.while_loop(cond, step, lo)


def _step_bytes(gpp: int, s_pad: int, d_pad: int, item: int,
                sub: int = 256) -> int:
    """Per-grid-step VMEM: double-buffered windows + f32 accumulators +
    lane-widened stats + a loop-body temp allowance (the fori-loop
    structure bounds temps at O(gpp * sub^2), not O(#blocks))."""
    win = gpp * s_pad * d_pad * item * 3    # q, do, dq windows
    win += s_pad * d_pad * item * 4         # k, v, dk, dv windows
    acc = (gpp + 2) * s_pad * d_pad * 4
    stats = 2 * gpp * s_pad * LANES * 4
    temps = 12 * gpp * sub * sub * 4
    return 2 * win + acc + stats + temps


def _pick_splits(group: int, s_pad: int, d_pad: int, item: int) -> int:
    for splits in (1, 2, 4, 8):
        if group % splits:
            continue
        if _step_bytes(group // splits, s_pad, d_pad, item) <= _VMEM_BUDGET:
            return splits
    return 0


def tri_bwd_eligible(q_shape, hkv: int, kv_len: int, causal: bool, window,
                     segment_ids, segment_starts, dtype) -> bool:
    bs, hq, q_len, d = q_shape
    if not causal or window is not None or segment_ids is not None \
            or segment_starts is not None:
        return False
    if q_len != kv_len or q_len < 1024:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    d_pad = _round_up(d, LANES)
    s_pad = _round_up(q_len, LANES)
    return _pick_splits(hq // hkv, s_pad, d_pad,
                        jnp.dtype(dtype).itemsize) > 0


def _tri_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, nb_ref,
                    dq_ref, dk_ref, dv_ref,
                    dq_scr, dk_scr, dv_scr,
                    *, sm_scale: float, gpp: int, splits: int, s_len: int,
                    s_pad: int, sub: int, leaf: int):
    t = pl.program_id(2)
    d_pad = q_ref.shape[-1]
    # trip count as a RUNTIME scalar (SMEM) so the loops below cannot be
    # proven static and unrolled — see _fori
    n_chunks = nb_ref[0]
    dtype = q_ref.dtype
    precision = (jax.lax.Precision.HIGHEST
                 if dtype == jnp.float32 else None)
    scale2 = jnp.asarray(sm_scale * _LOG2E, jnp.float32)

    dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(t == 0)
    def _init_kv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    # per-row delta D = rowsum(do*out) and the log2-domain lse arrive
    # PRE-WIDENED to LANES from XLA (tri_flash_bwd broadcasts them
    # host-side): an in-kernel (rows, 1) -> (rows, LANES) tile is the
    # pathological cross-lane broadcast (flash.py:306-312) — on the
    # current toolchain it also blew up register allocation (460M of
    # spill slots, the round-4 train failure), and XLA broadcasts are
    # free by comparison. The loop bodies slice the widened windows at
    # traced offsets directly (refs lower pl.ds fine).

    ci = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 0)
    leaf_tri = ci <= ri

    def rows_of(ref, r0, rows):
        return ref[0, :, pl.ds(r0, rows), :].reshape(gpp * rows, d_pad)

    def stat(ref, r0, rows):
        return ref[0, :, pl.ds(r0, rows), :].reshape(gpp * rows, LANES)

    def block(r0, rows, kc, vc, c0, cols, valid):
        """One emitted tile: ALL gpp heads' rows [r0, r0+rows) x global kv
        columns [c0, c0+cols) (kc/vc hold those columns). The group dim
        folds into the dot's row dim, so dk/dv's sum over heads happens
        inside the contraction. r0/c0 may be traced; rows/cols static."""
        qs = rows_of(q_ref, r0, rows)
        dos = rows_of(do_ref, r0, rows)
        rep = cols // LANES
        s2 = jax.lax.dot_general(
            qs, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * scale2
        if valid is not None:
            s2 = jnp.where(valid, s2, DEFAULT_MASK_VALUE)
        p = jnp.exp2(s2 - jnp.tile(stat(lse_ref, r0, rows), (1, rep)))
        dp = jax.lax.dot_general(
            dos, vc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        ds = (p * (dp - jnp.tile(stat(dd_ref, r0, rows), (1, rep)))
              * jnp.asarray(sm_scale, jnp.float32)).astype(dtype)
        pc = p.astype(dtype)
        dqc = jax.lax.dot_general(
            ds, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dq_scr[:, pl.ds(r0, rows), :] += dqc.reshape(gpp, rows, d_pad)
        dk_scr[pl.ds(c0, cols), :] += jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dv_scr[pl.ds(c0, cols), :] += jax.lax.dot_general(
            pc, dos, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def chunk_body(j):
        c0 = j * sub
        kc = k_ref[0, 0, pl.ds(c0, sub), :]
        vc = v_ref[0, 0, pl.ds(c0, sub), :]
        # the chunk's own diagonal at leaf granularity: masked leaf x leaf
        # squares plus (tt > 0) the unmasked strip of chunk columns to
        # their left. sub // leaf is small (<= 4) so this stays unrolled;
        # every shape is fixed across j, so Mosaic reuses the buffers.
        for tt in range(sub // leaf):
            l0 = c0 + tt * leaf
            valid = jnp.tile(leaf_tri & (ci + l0 < s_len), (gpp, 1))
            block(l0, leaf, kc[tt * leaf:(tt + 1) * leaf],
                  vc[tt * leaf:(tt + 1) * leaf], l0, leaf, valid)
            if tt:
                block(l0, leaf, kc[:tt * leaf], vc[:tt * leaf],
                      c0, tt * leaf, None)

        # tall unmasked rectangle below the chunk diagonal, as fixed
        # sub x sub row tiles over a dynamic-bound loop
        _fori(j + 1, n_chunks, lambda i: block(i * sub, sub, kc, vc,
                                               c0, sub, None))

    _fori(0, n_chunks, chunk_body)

    dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)

    @pl.when(t == splits - 1)
    def _write_kv():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def tri_flash_bwd(q, k, v, out, lse, do, *, sm_scale: float,
                  sub: int = 256, leaf: int = 128,
                  head_splits: int = None,
                  interpret: bool = False):
    """Returns (dq, dk, dv) for causal q_len == kv_len attention.

    head_splits overrides the automatic VMEM-driven choice of how many
    sequential steps the GQA group splits into (tests force > 1)."""
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, _ = k.shape
    assert q_len == kv_len
    group = hq // hkv
    sub = max(LANES, _round_up(sub, LANES))
    leaf = max(LANES, _round_up(leaf, LANES))
    while sub % leaf:
        leaf //= 2
    leaf = max(leaf, LANES)
    d_pad = _round_up(d, LANES)
    s_pad = _round_up(q_len, sub)
    splits = head_splits or _pick_splits(
        group, s_pad, d_pad, q.dtype.itemsize) or group
    assert group % splits == 0, (group, splits)
    gpp = group // splits

    q4 = _pad4(q, s_pad, d_pad)
    k4 = _pad4(k, s_pad, d_pad)
    v4 = _pad4(v, s_pad, d_pad)
    do4 = _pad4(do.astype(q.dtype), s_pad, d_pad)
    # D = rowsum(do * out) computed once in XLA (one fused elementwise+
    # reduce pass) — keeps the `out` operand out of the kernel's VMEM.
    # Both stats ship PRE-WIDENED to LANES (and lse pre-scaled into the
    # log2 domain): XLA lane-broadcasts are free, in-kernel ones are not
    # (see the kernel's stats note)
    dd = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                 axis=-1, keepdims=True)
    dd4 = jnp.pad(dd, ((0, 0), (0, 0), (0, s_pad - q_len), (0, 0)))
    dd4 = jnp.broadcast_to(dd4, (bs, hq, s_pad, LANES))
    # pad rows' lse = 0 is safe: pad q rows are zero, so their ds/p
    # contributions to dk/dv vanish against zero q/do rows, and their dq
    # rows are sliced off
    lse4 = jnp.pad((lse * _LOG2E)[..., None].astype(jnp.float32),
                   ((0, 0), (0, 0), (0, s_pad - q_len), (0, 0)))
    lse4 = jnp.broadcast_to(lse4, (bs, hq, s_pad, LANES))

    kernel = functools.partial(
        _tri_bwd_kernel, sm_scale=sm_scale, gpp=gpp, splits=splits,
        s_len=q_len, s_pad=s_pad, sub=sub, leaf=leaf)

    cost = pl.CostEstimate(
        flops=int(10 * bs * hq * q_len * kv_len * d * 0.5),
        bytes_accessed=int((3 * q4.size + 2 * k4.size + 2 * v4.size)
                           * q.dtype.itemsize),
        transcendentals=int(bs * hq * q_len * kv_len * 0.5),
    )

    def hd(b, h, t):
        return b, h * splits + t, 0, 0

    # optimization_barrier keeps the trip count a runtime operand — a bare
    # constant is folded into the Mosaic module and the loops unroll again
    nb = jax.lax.optimization_barrier(jnp.asarray([s_pad // sub], jnp.int32))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bs, hkv, splits),
        in_specs=[
            pl.BlockSpec((1, gpp, s_pad, d_pad), hd),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, t: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, t: (b, h, 0, 0)),
            pl.BlockSpec((1, gpp, s_pad, d_pad), hd),
            pl.BlockSpec((1, gpp, s_pad, LANES), hd),
            pl.BlockSpec((1, gpp, s_pad, LANES), hd),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, gpp, s_pad, d_pad), hd),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, t: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h, t: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, hq, s_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, hkv, s_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bs, hkv, s_pad, d_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((gpp, s_pad, d_pad), jnp.float32),   # dq acc
            pltpu.VMEM((s_pad, d_pad), jnp.float32),        # dk acc
            pltpu.VMEM((s_pad, d_pad), jnp.float32),        # dv acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=cost,
        interpret=interpret,
    )(q4, k4, v4, do4, lse4, dd4, nb)

    return (dq[:, :, :q_len, :d], dk[:, :, :q_len, :d],
            dv[:, :, :q_len, :d])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad4(x, s_to: int, d_to: int):
    ps, pd = s_to - x.shape[2], d_to - x.shape[3]
    if ps == 0 and pd == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, ps), (0, pd)))


# ---------------------------------------------------------------------------
# Q-banded triangle backward: the same decomposition gridded over row
# bands (mirror of ops/flash_tri.tri_block_fwd), for sequences whose
# one-shot q/do/dq windows exceed VMEM. Per band step, the q-side
# windows shrink to `band` rows while K/V stay whole-sequence resident;
# dk/dv accumulate in (s_pad, d_pad) f32 scratch ACROSS the sequential
# (head-split, band) steps — init at the first step, write at the last —
# the same cross-step-scratch idiom the one-shot kernel already uses for
# its head splits. dq writes per band block.
# ---------------------------------------------------------------------------

_BWD_BAND_ROWS = 2048


def _band_step_bytes(gpp: int, band: int, s_pad: int, d_pad: int,
                     item: int, sub: int = 256) -> int:
    win = gpp * band * d_pad * item * 3          # q, do, dq windows
    win += 2 * s_pad * d_pad * item              # k, v windows
    acc = gpp * band * d_pad * 4                 # dq acc
    acc += 2 * s_pad * d_pad * 4                 # dk, dv acc
    stats = 2 * gpp * band * LANES * 4
    temps = 12 * gpp * sub * sub * 4
    return 2 * win + acc + stats + temps


def tri_bwd_band_eligible(q_shape, hkv: int, kv_len: int, causal: bool,
                          window, segment_ids, segment_starts,
                          dtype) -> bool:
    bs, hq, q_len, d = q_shape
    if not causal or window is not None or segment_ids is not None \
            or segment_starts is not None:
        return False
    if q_len != kv_len or q_len < 1024:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    d_pad = _round_up(d, LANES)
    s_pad = _round_up(q_len, LANES)
    group = hq // hkv
    item = jnp.dtype(dtype).itemsize
    for splits in (1, 2, 4, 8):
        if group % splits:
            continue
        if _band_step_bytes(group // splits, _BWD_BAND_ROWS, s_pad, d_pad,
                            item) <= _VMEM_BUDGET:
            return True
    return False


def _tri_bwd_band_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                         nb_ref, dq_ref, dk_ref, dv_ref,
                         dq_scr, dk_scr, dv_scr,
                         *, sm_scale: float, gpp: int, splits: int,
                         n_bands: int, band: int, s_len: int, s_pad: int,
                         sub: int, leaf: int):
    t = pl.program_id(2)
    bi = pl.program_id(3)
    band0 = bi * band
    d_pad = q_ref.shape[-1]
    dtype = q_ref.dtype
    precision = (jax.lax.Precision.HIGHEST
                 if dtype == jnp.float32 else None)
    scale2 = jnp.asarray(sm_scale * _LOG2E, jnp.float32)

    dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when((t == 0) & (bi == 0))
    def _init_kv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    # dd/lse arrive pre-widened to LANES and lse pre-scaled to the log2
    # domain (see _tri_bwd_kernel's stats note)

    ci = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 0)
    leaf_tri = ci <= ri

    def rows_of(ref, r0, rows):
        return ref[0, :, pl.ds(r0, rows), :].reshape(gpp * rows, d_pad)

    def stat(ref, r0, rows):
        return ref[0, :, pl.ds(r0, rows), :].reshape(gpp * rows, LANES)

    def block(r0, rows, kc, vc, c0, cols, valid):
        """ALL gpp heads' band-local rows [r0, r0+rows) x GLOBAL kv
        columns [c0, c0+cols) (kc/vc hold those columns). Identical math
        to the one-shot kernel's block; only the row/col coordinate
        spaces differ (rows band-local, cols global)."""
        qs = rows_of(q_ref, r0, rows)
        dos = rows_of(do_ref, r0, rows)
        rep = cols // LANES
        s2 = jax.lax.dot_general(
            qs, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * scale2
        if valid is not None:
            s2 = jnp.where(valid, s2, DEFAULT_MASK_VALUE)
        p = jnp.exp2(s2 - jnp.tile(stat(lse_ref, r0, rows), (1, rep)))
        dp = jax.lax.dot_general(
            dos, vc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        ds = (p * (dp - jnp.tile(stat(dd_ref, r0, rows), (1, rep)))
              * jnp.asarray(sm_scale, jnp.float32)).astype(dtype)
        pc = p.astype(dtype)
        dqc = jax.lax.dot_general(
            ds, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dq_scr[:, pl.ds(r0, rows), :] += dqc.reshape(gpp, rows, d_pad)
        dk_scr[pl.ds(c0, cols), :] += jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dv_scr[pl.ds(c0, cols), :] += jax.lax.dot_general(
            pc, dos, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    # trip count as a RUNTIME scalar (SMEM) so the loops below cannot be
    # proven static and unrolled — see _fori
    n_row_tiles = nb_ref[0]

    # --- rect phase: chunks strictly left of the band (all valid) --------
    def left_body(j):
        c0 = j * sub
        kc = k_ref[0, 0, pl.ds(c0, sub), :]
        vc = v_ref[0, 0, pl.ds(c0, sub), :]
        _fori(0, n_row_tiles, lambda i: block(i * sub, sub, kc, vc,
                                              c0, sub, None))

    _fori(0, band0 // sub, left_body)

    # --- diag phase: the band's own chunks (leaf diagonals + strips +
    # within-band tall rects), band-local row coords, global col coords --
    def chunk_body(jj):
        c0l = jj * sub                     # band-local chunk start
        c0g = band0 + c0l                  # global
        kc = k_ref[0, 0, pl.ds(c0g, sub), :]
        vc = v_ref[0, 0, pl.ds(c0g, sub), :]
        for tt in range(sub // leaf):
            l0 = c0l + tt * leaf
            gl0 = band0 + l0
            valid = jnp.tile(leaf_tri & (ci + gl0 < s_len), (gpp, 1))
            block(l0, leaf, kc[tt * leaf:(tt + 1) * leaf],
                  vc[tt * leaf:(tt + 1) * leaf], gl0, leaf, valid)
            if tt:
                block(l0, leaf, kc[:tt * leaf], vc[:tt * leaf],
                      c0g, tt * leaf, None)

        _fori(jj + 1, n_row_tiles, lambda i: block(i * sub, sub, kc, vc,
                                                   c0g, sub, None))

    _fori(0, n_row_tiles, chunk_body)

    dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)

    @pl.when((t == splits - 1) & (bi == n_bands - 1))
    def _write_kv():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def tri_flash_bwd_banded(q, k, v, out, lse, do, *, sm_scale: float,
                         sub: int = 256, leaf: int = 128,
                         head_splits: int = None, band_rows: int = None,
                         interpret: bool = False):
    """Banded-grid (dq, dk, dv) for causal q_len == kv_len attention —
    the long-sequence form of tri_flash_bwd (same math, same emission,
    row-banded grid)."""
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, _ = k.shape
    assert q_len == kv_len
    group = hq // hkv
    sub = max(LANES, _round_up(sub, LANES))
    leaf = max(LANES, _round_up(leaf, LANES))
    while sub % leaf:
        leaf //= 2
    leaf = max(leaf, LANES)
    d_pad = _round_up(d, LANES)
    band = max(sub, _round_up(min(band_rows or _BWD_BAND_ROWS, q_len),
                              sub))
    s_pad = _round_up(q_len, band)
    n_bands = s_pad // band
    item = q.dtype.itemsize
    if head_splits:
        splits = head_splits
    else:
        splits = 0
        for cand in (1, 2, 4, 8):
            if group % cand:
                continue
            if _band_step_bytes(group // cand, band, s_pad, d_pad,
                                item) <= _VMEM_BUDGET:
                splits = cand
                break
        splits = splits or group
    assert group % splits == 0, (group, splits)
    gpp = group // splits

    q4 = _pad4(q, s_pad, d_pad)
    k4 = _pad4(k, s_pad, d_pad)
    v4 = _pad4(v, s_pad, d_pad)
    do4 = _pad4(do.astype(q.dtype), s_pad, d_pad)
    # stats pre-widened to LANES, lse pre-scaled to log2 domain — see
    # tri_flash_bwd's stats note
    dd = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                 axis=-1, keepdims=True)
    dd4 = jnp.pad(dd, ((0, 0), (0, 0), (0, s_pad - q_len), (0, 0)))
    dd4 = jnp.broadcast_to(dd4, (bs, hq, s_pad, LANES))
    lse4 = jnp.pad((lse * _LOG2E)[..., None].astype(jnp.float32),
                   ((0, 0), (0, 0), (0, s_pad - q_len), (0, 0)))
    lse4 = jnp.broadcast_to(lse4, (bs, hq, s_pad, LANES))

    kernel = functools.partial(
        _tri_bwd_band_kernel, sm_scale=sm_scale, gpp=gpp, splits=splits,
        n_bands=n_bands, band=band, s_len=q_len, s_pad=s_pad, sub=sub,
        leaf=leaf)

    cost = pl.CostEstimate(
        flops=int(10 * bs * hq * q_len * kv_len * d * 0.5),
        bytes_accessed=int((3 * q4.size
                            + n_bands * (k4.size + v4.size) * 2)
                           * q.dtype.itemsize),
        transcendentals=int(bs * hq * q_len * kv_len * 0.5),
    )

    def hd(b, h, t, i):
        return b, h * splits + t, i, 0

    def whole(b, h, t, i):
        return b, h, 0, 0

    # optimization_barrier: see tri_flash_bwd's nb note
    nb = jax.lax.optimization_barrier(jnp.asarray([band // sub], jnp.int32))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bs, hkv, splits, n_bands),
        in_specs=[
            pl.BlockSpec((1, gpp, band, d_pad), hd),
            pl.BlockSpec((1, 1, s_pad, d_pad), whole),
            pl.BlockSpec((1, 1, s_pad, d_pad), whole),
            pl.BlockSpec((1, gpp, band, d_pad), hd),
            pl.BlockSpec((1, gpp, band, LANES), hd),
            pl.BlockSpec((1, gpp, band, LANES), hd),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, gpp, band, d_pad), hd),
            pl.BlockSpec((1, 1, s_pad, d_pad), whole),
            pl.BlockSpec((1, 1, s_pad, d_pad), whole),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, hq, s_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, hkv, s_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bs, hkv, s_pad, d_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((gpp, band, d_pad), jnp.float32),    # dq acc
            pltpu.VMEM((s_pad, d_pad), jnp.float32),        # dk acc
            pltpu.VMEM((s_pad, d_pad), jnp.float32),        # dv acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=cost,
        interpret=interpret,
    )(q4, k4, v4, do4, lse4, dd4, nb)

    return (dq[:, :, :q_len, :d], dk[:, :, :q_len, :d],
            dv[:, :, :q_len, :d])
