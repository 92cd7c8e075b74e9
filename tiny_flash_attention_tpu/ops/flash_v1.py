"""FlashAttention-1 Pallas kernel: KV-outer loop order, persistent q state.

The reference implements FA1 twice (pure python tiny_flash_attn.py:4-79;
CUDA flash_attention.cu:158-315 with gMax/gDenom in GLOBAL memory reloaded
every iteration — the commented drawback at :224-229). This is the TPU
rendition of the same loop order, kept for the teaching ladder and loop-
order parity: the grid walks KV blocks in the OUTER sequential dimension and
q blocks inside, so the online-softmax state (m, l, acc) for EVERY q block
must persist across the whole sweep — here as full-q-length VMEM scratch
(the analog of the reference's global-memory buffers; VMEM capacity caps
q_len where the CUDA version paid HBM reloads instead).

Why FA2 wins (ops/flash.py): with Q outer, state is one tile, VMEM-resident
by construction, and the output writes once per q block. Benchmark both to
see the gap; this kernel exists to make the gap observable, exactly like
the reference's v1/v2 pair.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_flash_attention_tpu.ops.configs import LANES
from tiny_flash_attention_tpu.ops.flash import DEFAULT_MASK_VALUE

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)


def _v1_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
               *, causal, sm_scale, block_q, block_kv, q_len, kv_len,
               kv_padded):
    kvi, qi = pl.program_id(2), pl.program_id(3)
    qoff = qi * block_q

    @pl.when((kvi == 0) & (qi == 0))
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    offset = kv_len - q_len
    should_run = (kvi * block_kv <= (qi + 1) * block_q - 1 + offset
                  if causal else True)

    @pl.when(should_run)
    def _step():
        q = q_ref[0, 0]
        q = (q * jnp.asarray(sm_scale * _LOG2E, q.dtype)).astype(q.dtype)
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if causal or kv_padded:
            ci = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            valid = None
            if causal:
                ri = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 0)
                valid = (ci - ri) <= (qoff + offset - kvi * block_kv)
            if kv_padded:
                ok = kvi * block_kv + ci < kv_len
                valid = ok if valid is None else valid & ok
            s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        # reload this q block's running state (the gMax/gDenom reload of the
        # reference's v1 kernel, flash_attention.cu:224-229 — here a VMEM
        # dynamic slice rather than an HBM round trip)
        m_prev = m_scr[pl.ds(qoff, block_q)]
        l_prev = l_scr[pl.ds(qoff, block_q)]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - jnp.tile(m_next, (1, block_kv // LANES)))
        if causal and offset < 0:
            p *= jnp.tile(m_next > 0.5 * DEFAULT_MASK_VALUE,
                          (1, block_kv // LANES))
        m_scr[pl.ds(qoff, block_q)] = m_next
        l_scr[pl.ds(qoff, block_q)] = alpha * l_prev + jnp.sum(
            p, axis=1, keepdims=True)
        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_rep = acc_scr.shape[-1] // LANES
        acc_scr[pl.ds(qoff, block_q)] = (
            acc_scr[pl.ds(qoff, block_q)] * jnp.tile(alpha, (1, d_rep)) + pv)

    # v1's signature cost: the output flushes on every grid step (the
    # reference writes O back each iteration, flash_attention.cu:303-308);
    # only the final kv sweep's values survive.
    l = l_scr[pl.ds(qoff, block_q)]
    l_safe = jnp.where((l == 0.0) | jnp.isnan(l), 1.0, l)
    d_rep = acc_scr.shape[-1] // LANES
    o_ref[0, 0] = (acc_scr[pl.ds(qoff, block_q)]
                   / jnp.tile(l_safe, (1, d_rep))).astype(o_ref.dtype)
    lse_ref[0, 0] = (m_scr[pl.ds(qoff, block_q), :1] * _LN2
                     + jnp.log(l_safe[:, :1])).astype(lse_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "causal", "sm_scale", "block_q", "block_kv", "return_lse", "interpret"))
def flash_attention_v1(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """FA1-loop-order forward (teaching/benchmark tier; use flash_attention).

    q (b, h, q_len, d); k/v (b, h, kv_len, d) — no GQA folding here, this is
    the minimal loop-order study. q_len capped by VMEM (state is q-resident).
    """
    bs, h, q_len, d = q.shape
    kv_len = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q = min(block_q, _round_up(q_len, LANES))
    block_kv = min(block_kv, _round_up(kv_len, LANES))
    d_pad = _round_up(d, LANES)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_kv)
    n_q, n_kv = q_pad // block_q, kv_pad // block_kv

    qp = _pad4(q, q_pad, d_pad)
    kp = _pad4(k, kv_pad, d_pad)
    vp = _pad4(v, kv_pad, d_pad)

    out, lse = pl.pallas_call(
        functools.partial(
            _v1_kernel, causal=causal, sm_scale=sm_scale, block_q=block_q,
            block_kv=block_kv, q_len=q_len, kv_len=kv_len,
            kv_padded=kv_pad != kv_len),
        grid=(bs, h, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, j, i: (b, h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, j, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, h, q_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bs, h, q_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_pad, LANES), jnp.float32),
            pltpu.VMEM((q_pad, LANES), jnp.float32),
            pltpu.VMEM((q_pad, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp)
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
