"""Context parallelism: ring attention, Ulysses, and all-gather modes.

The reference's KV-streaming inner loop (cutlass flash_attention.cu:549-606)
is the intra-chip analog of ring attention (SURVEY.md section 5 long-context
row): here the same online-softmax block merge runs ACROSS chips. Four
sequence-sharding modes, all over a mesh 'ctx' axis:

  * ring_attention: K/V shards rotate around the ring via `ppermute` while
    each chip runs the local Pallas flash kernel on the block in front of it;
    partial (out, lse) pairs merge with the cross-block log-sum-exp combine.
    Point-to-point ICI traffic, overlappable with compute. Causal handled
    per ring step: earlier-source blocks attend fully, the diagonal block
    causally, later blocks are skipped (lax.switch over three kernels).
  * zigzag ring (make_zigzag_ring_attention): striped sequence placement
    (chip i holds stripes i and 2n-1-i) so causal ring work is BALANCED —
    every chip does ~2 stripe-units at every step by construction (see the
    derivation at the zigzag section below and docs/online_softmax.md).
  * ulysses_attention: all-to-all redistributes heads <-> sequence so each
    chip sees the FULL sequence for a head subset, runs plain causal flash,
    and all-to-alls back. Two collectives, exact causal semantics.
  * allgather_attention: the bandwidth-simple mode — gather all KV shards,
    local flash (non-causal only; ring covers causal CP).

All modes are forward paths (serving / long-context prefill); the GSPMD
training step handles training-side sharding.
"""

from __future__ import annotations


import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.ops.flash import flash_attention


def _merge(o, lse, o_i, lse_i):
    """Cross-block online-softmax combine of normalized partials."""
    lse_new = jnp.logaddexp(lse, lse_i)
    w_old = jnp.exp(lse - lse_new)[..., None]
    w_new = jnp.exp(lse_i - lse_new)[..., None]
    # exp(-inf - -inf) -> nan guard for rows nobody has touched yet
    w_old = jnp.where(jnp.isnan(w_old), 0.0, w_old)
    w_new = jnp.where(jnp.isnan(w_new), 0.0, w_new)
    return o * w_old + o_i.astype(o.dtype) * w_new, lse_new


def make_ring_attention(mesh: Mesh, *, axis_name: str = "ctx",
                        causal: bool = True,
                        sm_scale: Optional[float] = None,
                        config: Optional[FlashConfig] = None):
    """Returns ring(q, k, v) for shard_map use: all inputs are LOCAL
    sequence shards (b, h, s_local, d); output is the local shard of the
    exact global attention.

    `config` is threaded into every local flash_attention call so the
    composition CP wrapper + Pallas kernel is the tested/deployed one (an
    explicit config always takes the kernel path, bypassing the
    small-shape XLA routing).

    NOTE on causal load balance: with contiguous shards chip i computes
    i+1 of the n blocks (the top of the ring idles). Use
    make_zigzag_ring_attention + zigzag_permute for balanced causal CP.
    """
    n = mesh.shape[axis_name]
    perm = [(i, (i + 1) % n) for i in range(n)]

    def ring(q, k, v):
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(
            q.shape[-1])
        idx = jax.lax.axis_index(axis_name)
        lse = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)
        o = jnp.zeros(q.shape, jnp.float32)
        kb, vb = k, v

        def full_fn(q, kb, vb):
            return flash_attention(q, kb, vb, causal=False, sm_scale=scale,
                                   config=config, return_lse=True)

        def diag_fn(q, kb, vb):
            return flash_attention(q, kb, vb, causal=True, sm_scale=scale,
                                   config=config, return_lse=True)

        def skip_fn(q, kb, vb):
            return (jnp.zeros(q.shape, q.dtype),
                    jnp.full(q.shape[:3], -jnp.inf, jnp.float32))

        for step in range(n):
            # Issue the NEXT block's rotation BEFORE this block's compute:
            # XLA turns ppermute into collective-permute-start/-done pairs,
            # so ordering the start ahead of the attention kernel lets the
            # ICI transfer ride under the MXU work (the cross-chip analog
            # of the reference's async-load-next-K-during-gemm discipline,
            # cutlass flash_attention.cu:585-590).
            if step < n - 1:
                kb_next = jax.lax.ppermute(kb, axis_name, perm)
                vb_next = jax.lax.ppermute(vb, axis_name, perm)
            src = (idx - step) % n  # ring shard this kb/vb originated from
            if causal:
                branch = jnp.where(src == idx, 1,
                                   jnp.where(src < idx, 0, 2))
                o_i, lse_i = jax.lax.switch(
                    branch, [full_fn, diag_fn, skip_fn], q, kb, vb)
            else:
                o_i, lse_i = full_fn(q, kb, vb)
            o, lse = _merge(o, lse, o_i, lse_i)
            if step < n - 1:
                kb, vb = kb_next, vb_next
        return o.astype(q.dtype)

    return ring


def ring_attention_sharded(mesh: Mesh, *, causal: bool = True,
                           sm_scale: Optional[float] = None,
                           data_axis: str = "data",
                           ctx_axis: str = "model",
                           config: Optional[FlashConfig] = None):
    """jit-ready wrapper: q/k/v (b, h, S, d) with S sharded on ctx_axis."""
    ring = make_ring_attention(mesh, axis_name=ctx_axis, causal=causal,
                               sm_scale=sm_scale, config=config)
    spec = P(data_axis, None, ctx_axis, None)
    return jax.jit(jax.shard_map(
        ring, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False))


# --- zigzag (balanced causal) ring ------------------------------------------
# With contiguous sequence shards, causal ring attention is load-imbalanced:
# chip i runs i+1 non-skipped steps while every chip pays all n-1 K/V
# rotations. The standard fix is striped ("zigzag") placement: the sequence
# is cut into 2n stripes and chip i holds stripes (i, 2n-1-i) — one early,
# one late — so EVERY chip does the same ~2 stripe-units of work at EVERY
# step, by construction:
#
#   incoming block from src holds stripes (c, d) = (src, 2n-1-src); local q
#   holds (a, b) = (idx, 2n-1-idx), a < n <= b:
#     src < idx:  (a|c full) (b|c full) (b|d skip)   -> 2 units
#     src == idx: (a|c diag) (b|c full) (b|d diag)   -> 2 units
#     src > idx:  (a|c skip) (b|c full) (b|d full)   -> 2 units
#
# TPU-first detail: each branch folds into 1-2 CONTIGUOUS flash calls —
# "full kv then diagonal kv" is exactly what the flagship kernel's
# decode-shape offset rule (col <= row + kv_len - q_len, ops/flash.py
# _build_worklist) computes for causal(q_late, concat(c, d)) — so no custom
# masks, and the work-list grid keeps skipping dead tiles inside each call.


def zigzag_permutation(seq_len: int, n: int) -> np.ndarray:
    """Global position order such that contiguous shard i of the permuted
    sequence holds stripes (i, 2n-1-i) of the original."""
    assert seq_len % (2 * n) == 0, (seq_len, n)
    stripe = seq_len // (2 * n)
    order = []
    for i in range(n):
        order.extend(range(i * stripe, (i + 1) * stripe))
        order.extend(range((2 * n - 1 - i) * stripe, (2 * n - i) * stripe))
    return np.asarray(order, np.int64)


def zigzag_permute(x: jax.Array, n: int, axis: int = 2) -> jax.Array:
    """Reorders a sequence axis into zigzag shard order (host-level data
    prep; its cost is one gather, paid once per sequence)."""
    return jnp.take(x, jnp.asarray(zigzag_permutation(x.shape[axis], n)),
                    axis=axis)


def zigzag_unpermute(x: jax.Array, n: int, axis: int = 2) -> jax.Array:
    """Inverse of zigzag_permute."""
    perm = zigzag_permutation(x.shape[axis], n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return jnp.take(x, jnp.asarray(inv), axis=axis)


def make_zigzag_ring_attention(mesh: Mesh, *, axis_name: str = "ctx",
                               sm_scale: Optional[float] = None,
                               config: Optional[FlashConfig] = None):
    """Returns ring(q, k, v) for shard_map use over ZIGZAG-placED shards:
    local arrays are (b, h, 2L, d) = stripes (idx, 2n-1-idx) concatenated
    (see zigzag_permute). Output is the local shard of exact global causal
    attention, in the same zigzag layout."""
    n = mesh.shape[axis_name]
    perm = [(i, (i + 1) % n) for i in range(n)]

    def ring(q, k, v):
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(
            q.shape[-1])
        if n == 1:
            return flash_attention(q, k, v, causal=True, sm_scale=scale,
                                   config=config)
        idx = jax.lax.axis_index(axis_name)
        L = q.shape[2] // 2
        q_a, q_b = q[:, :, :L], q[:, :, L:]

        def flash(qq, kk, vv, causal):
            return flash_attention(qq, kk, vv, causal=causal,
                                   sm_scale=scale, config=config,
                                   return_lse=True)

        def before(q_a, q_b, kb, vb):      # src < idx: (a|c) + (b|c) full
            o, l = flash(jnp.concatenate([q_a, q_b], axis=2),
                         kb[:, :, :L], vb[:, :, :L], causal=False)
            return o, l

        def self_(q_a, q_b, kb, vb):       # diag(a|c) + causal(b, [c d])
            oa, la = flash(q_a, kb[:, :, :L], vb[:, :, :L], causal=True)
            ob, lb = flash(q_b, kb, vb, causal=True)  # offset: c full, d diag
            return (jnp.concatenate([oa, ob], axis=2),
                    jnp.concatenate([la, lb], axis=2))

        def after(q_a, q_b, kb, vb):       # (b|c) + (b|d) full; a skips
            ob, lb = flash(q_b, kb, vb, causal=False)
            return (jnp.concatenate([jnp.zeros_like(ob), ob], axis=2),
                    jnp.concatenate([jnp.full_like(lb, -jnp.inf), lb],
                                    axis=2))

        lse = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)
        o = jnp.zeros(q.shape, jnp.float32)
        kb, vb = k, v
        for step in range(n):
            if step < n - 1:   # issue next rotation before compute (overlap)
                kb_next = jax.lax.ppermute(kb, axis_name, perm)
                vb_next = jax.lax.ppermute(vb, axis_name, perm)
            src = (idx - step) % n
            branch = jnp.where(src == idx, 1, jnp.where(src < idx, 0, 2))
            o_i, lse_i = jax.lax.switch(
                branch, [before, self_, after], q_a, q_b, kb, vb)
            o, lse = _merge(o, lse, o_i, lse_i)
            if step < n - 1:
                kb, vb = kb_next, vb_next
        return o.astype(q.dtype)

    return ring


def zigzag_ring_attention_sharded(mesh: Mesh, *,
                                  sm_scale: Optional[float] = None,
                                  data_axis: str = "data",
                                  ctx_axis: str = "model",
                                  config: Optional[FlashConfig] = None):
    """jit-ready balanced causal CP: q/k/v (b, h, S, d) ALREADY in zigzag
    order (zigzag_permute), S sharded on ctx_axis."""
    ring = make_zigzag_ring_attention(mesh, axis_name=ctx_axis,
                                      sm_scale=sm_scale, config=config)
    spec = P(data_axis, None, ctx_axis, None)
    return jax.jit(jax.shard_map(
        ring, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False))


def ulysses_attention_sharded(mesh: Mesh, *, causal: bool = True,
                              sm_scale: Optional[float] = None,
                              data_axis: str = "data",
                              ctx_axis: str = "model",
                              config: Optional[FlashConfig] = None):
    """jit-ready wrapper: q/k/v (b, h, S, d) with S sharded on ctx_axis and
    h % mesh.shape[ctx_axis] == 0."""
    ulysses = make_ulysses_attention(mesh, axis_name=ctx_axis, causal=causal,
                                     sm_scale=sm_scale, config=config)
    spec = P(data_axis, None, ctx_axis, None)
    return jax.jit(jax.shard_map(
        ulysses, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False))


def make_ulysses_attention(mesh: Mesh, *, axis_name: str = "ctx",
                           causal: bool = True,
                           sm_scale: Optional[float] = None,
                           config: Optional[FlashConfig] = None):
    """Returns ulysses(q, k, v): inputs are local sequence shards
    (b, h, s_local, d) with h % axis_size == 0; internally all-to-alls to
    (b, h/n, S, d), runs exact causal flash, and transposes back."""
    n = mesh.shape[axis_name]

    def ulysses(q, k, v):
        def scatter_heads(x):
            # (b, h, s_local, d) -> (b, h/n, S, d)
            return jax.lax.all_to_all(x, axis_name, split_axis=1,
                                      concat_axis=2, tiled=True)

        def gather_heads(x):
            return jax.lax.all_to_all(x, axis_name, split_axis=2,
                                      concat_axis=1, tiled=True)

        qh, kh, vh = scatter_heads(q), scatter_heads(k), scatter_heads(v)
        oh = flash_attention(qh, kh, vh, causal=causal, sm_scale=sm_scale,
                             config=config)
        return gather_heads(oh)

    return ulysses


def make_allgather_attention(mesh: Mesh, *, axis_name: str = "ctx",
                             sm_scale: Optional[float] = None,
                             config: Optional[FlashConfig] = None):
    """Non-causal all-gather context parallelism: gather KV, local flash."""
    def ag(q, k, v):
        k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
        return flash_attention(q, k_full, v_full, causal=False,
                               sm_scale=sm_scale, config=config)

    return ag
