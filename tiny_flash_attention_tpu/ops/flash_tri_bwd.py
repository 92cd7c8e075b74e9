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

Math per block (rows R of head g, cols C of the kv chunk), from the
saved forward (out, lse) — the standard FA2 backward identities:

    s  = q @ k^T * scale            (log2-domain: q pre-scaled)
    p  = exp2(s2 - lse2)            (s2, lse2 in the log2 domain)
    dp = do @ v^T
    D  = rowsum(do * out)           (computed once per step)
    ds = p * (dp - D) * scale
    dq[rows] += ds @ k
    dk[cols] += ds^T @ q
    dv[cols] += p^T @ do

Scope mirrors the forward kernel: causal, q_len == kv_len, no window /
segments, bf16/fp32, VMEM-gated. Reference analog: the LSE the reference
emits "for a backward" it never built (cutlass flash_attention.cu:614-623)
feeds exactly the p-reconstruction above.
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

_VMEM_BUDGET = 88 * 2**20


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
    rows = (hq // hkv) * s_pad
    item = jnp.dtype(dtype).itemsize
    ins = (2 * rows + 3 * s_pad) * d_pad * item + rows * 4  # q,do,out,k,v,lse
    accs = (rows + 2 * s_pad) * d_pad * 4                    # dq,dk,dv f32
    stats = 2 * rows * LANES * 4                             # D, lse2
    return 2 * ins + accs + stats + rows * 256 * 4 <= _VMEM_BUDGET


def _tri_bwd_kernel(q_ref, k_ref, v_ref, do_ref, out_ref, lse_ref,
                    dq_ref, dk_ref, dv_ref,
                    dq_scr, dk_scr, dv_scr,
                    *, sm_scale: float, group: int, s_len: int, s_pad: int,
                    sub: int, leaf: int):
    d_pad = q_ref.shape[-1]
    n_chunks = s_pad // sub
    dtype = q_ref.dtype
    precision = (jax.lax.Precision.HIGHEST
                 if dtype == jnp.float32 else None)
    rows_total = group * s_pad

    dq_scr[...] = jnp.zeros_like(dq_scr)
    dk_scr[...] = jnp.zeros_like(dk_scr)
    dv_scr[...] = jnp.zeros_like(dv_scr)

    q_raw = q_ref[0].reshape(rows_total, d_pad)
    qs_all = (q_raw * jnp.asarray(sm_scale * _LOG2E, dtype)).astype(dtype)
    do_all = do_ref[0].reshape(rows_total, d_pad)
    out_all = out_ref[0].reshape(rows_total, d_pad)
    # D = rowsum(do * out): one elementwise pass + reduce per step; the
    # reduction result is lane-replicated (rows, 1->LANES semantics)
    D = jnp.sum(do_all.astype(jnp.float32) * out_all.astype(jnp.float32),
                axis=1, keepdims=True)
    # lse in the log2 domain for the exp2 reconstruction, widened ONCE to
    # LANES so per-block use is cheap lane-block tiling (a loaded (rows,1)
    # value broadcast per block would be the pathological cross-lane
    # gather — see flash.py:306-312; reduce results like D are exempt,
    # they come back lane-replicated)
    lse2 = jnp.tile(lse_ref[0].reshape(rows_total, 1), (1, LANES)) \
        * jnp.asarray(_LOG2E, jnp.float32)
    k_all = k_ref[0, 0]
    v_all = v_ref[0, 0]

    ci = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 0)
    leaf_valid = ci <= ri

    def block(g, r0, r1, c0, c1, valid):
        """One emitted block: rows [r0, r1) of head g x global kv columns
        [c0, c1). Updates dq rows and dk/dv columns."""
        base = g * s_pad
        rs = slice(base + r0, base + r1)
        kc = k_all[c0:c1]
        vc = v_all[c0:c1]
        cols = c1 - c0
        s2 = jax.lax.dot_general(
            qs_all[rs, :], kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if valid is not None:
            s2 = jnp.where(valid, s2, DEFAULT_MASK_VALUE)
        p = jnp.exp2(s2 - jnp.tile(lse2[rs, :], (1, cols // LANES)))
        dp = jax.lax.dot_general(
            do_all[rs, :], vc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        ds = (p * (dp - D[rs, :])
              * jnp.asarray(sm_scale, jnp.float32)).astype(dtype)
        pc = p.astype(dtype)
        dq_scr[rs, :] += jax.lax.dot_general(
            ds, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dk_scr[c0:c1, :] += jax.lax.dot_general(
            ds, q_raw[rs, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dv_scr[c0:c1, :] += jax.lax.dot_general(
            pc, do_all[rs, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    for j in range(n_chunks):
        c0 = j * sub
        # the chunk's own diagonal at leaf granularity
        for t in range(sub // leaf):
            l0 = c0 + t * leaf
            valid = leaf_valid
            if l0 + leaf > s_len:
                valid = valid & (ci < s_len - l0)
            for g in range(group):
                block(g, l0, l0 + leaf, l0, l0 + leaf, valid)
            if t > 0:
                for g in range(group):
                    block(g, l0, l0 + leaf, c0, l0, None)
        # tall unmasked rectangle below the chunk diagonal
        r0 = c0 + sub
        if r0 < s_pad:
            for g in range(group):
                block(g, r0, s_pad, c0, c0 + sub, None)

    dq_ref[0] = dq_scr[...].astype(dq_ref.dtype).reshape(dq_ref.shape[1:])
    dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def tri_flash_bwd(q, k, v, out, lse, do, *, sm_scale: float,
                  sub: int = 256, leaf: int = 128,
                  interpret: bool = False):
    """Returns (dq, dk, dv) for causal q_len == kv_len attention."""
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
    rows = group * s_pad

    q4 = _pad4(q, s_pad, d_pad)
    k4 = _pad4(k, s_pad, d_pad)
    v4 = _pad4(v, s_pad, d_pad)
    do4 = _pad4(do.astype(q.dtype), s_pad, d_pad)
    out4 = _pad4(out, s_pad, d_pad)
    # pad rows' lse: 0 is safe (p = exp2(mask - 0) ~ 0 against real cols;
    # pad q rows are all-zero so even p = 1 would add zeros to dk/dv —
    # but pad COLS in k are zero and pad q rows zero, s2 = 0 - 0 = 0,
    # p = 1 for pad-row x pad-col pairs; their dv contribution is
    # p^T @ do_pad_rows = 0 since do pad rows are zero)
    lse4 = jnp.pad(lse[..., None], ((0, 0), (0, 0),
                                    (0, s_pad - q_len), (0, 0)))

    kernel = functools.partial(
        _tri_bwd_kernel, sm_scale=sm_scale, group=group, s_len=q_len,
        s_pad=s_pad, sub=sub, leaf=leaf)

    cost = pl.CostEstimate(
        flops=int(10 * bs * hq * q_len * kv_len * d * 0.5),
        bytes_accessed=int((3 * q4.size + 2 * k4.size + 2 * v4.size)
                           * q.dtype.itemsize),
        transcendentals=int(bs * hq * q_len * kv_len * 0.5),
    )

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bs, hkv),
        in_specs=[
            pl.BlockSpec((1, group, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, group, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, group, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, group, s_pad, 1), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, group, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d_pad), lambda b, h: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, hq, s_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, hkv, s_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bs, hkv, s_pad, d_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, d_pad), jnp.float32),    # dq accumulator
            pltpu.VMEM((s_pad, d_pad), jnp.float32),   # dk accumulator
            pltpu.VMEM((s_pad, d_pad), jnp.float32),   # dv accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=cost,
        interpret=interpret,
    )(q4, k4, v4, do4, out4, lse4)

    return (dq[:, :, :q_len, :d], dk[:, :, :q_len, :d],
            dv[:, :, :q_len, :d])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad4(x, s_to: int, d_to: int):
    ps, pd = s_to - x.shape[2], d_to - x.shape[3]
    if ps == 0 and pd == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, ps), (0, pd)))
