"""Packed-sequence (segment-ids) masking: fwd + grads vs per-sequence calls.

Two sequences packed into one row with segment ids must produce exactly the
attention each sequence would get alone. Padding tokens share an id, so —
like the stock splash/flash semantics ("only tokens with the same id can
attend") — they attend each other; callers slice their rows away.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.utils import assert_close

INTERP = FlashConfig(block_q=128, block_kv=128, interpret=True)

L1, L2, PAD = 100, 120, 36          # packed length 256 (two blocks)
D, HQ, HKV = 64, 4, 2


def make_packed(key):
    kq, kk, kv = jax.random.split(key, 3)
    L = L1 + L2 + PAD
    q = jax.random.normal(kq, (1, HQ, L, D), jnp.float32)
    k = jax.random.normal(kk, (1, HKV, L, D), jnp.float32)
    v = jax.random.normal(kv, (1, HKV, L, D), jnp.float32)
    seg = jnp.asarray([[1] * L1 + [2] * L2 + [-7] * PAD], jnp.int32)
    return q, k, v, seg


@pytest.mark.parametrize("causal", [False, True])
def test_packed_matches_separate(causal):
    q, k, v, seg = make_packed(jax.random.key(0))
    got, lse = flash_attention(q, k, v, causal=causal,
                               segment_ids=(seg, seg), config=INTERP,
                               return_lse=True)
    for lo, hi in ((0, L1), (L1, L1 + L2)):
        want, want_lse = flash_attention(
            q[:, :, lo:hi], k[:, :, lo:hi], v[:, :, lo:hi], causal=causal,
            config=INTERP, return_lse=True)
        assert_close(got[:, :, lo:hi], want, atol=1e-4,
                     name=f"seg[{lo}:{hi}]")
        assert_close(lse[:, :, lo:hi], want_lse, atol=1e-4,
                     name=f"lse[{lo}:{hi}]")


@pytest.mark.parametrize("causal", [False, True])
def test_packed_grads_match_separate(causal):
    q, k, v, seg = make_packed(jax.random.key(1))

    def loss_packed(q, k, v):
        out = flash_attention(q, k, v, causal=causal,
                              segment_ids=(seg, seg), config=INTERP)
        return (out.astype(jnp.float32) ** 2).sum()

    dq, dk, dv = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)

    for lo, hi in ((0, L1), (L1, L1 + L2)):
        def loss_sep(qs, ks, vs):
            out = flash_attention(qs, ks, vs, causal=causal, config=INTERP)
            return (out.astype(jnp.float32) ** 2).sum()
        dq_s, dk_s, dv_s = jax.grad(loss_sep, argnums=(0, 1, 2))(
            q[:, :, lo:hi], k[:, :, lo:hi], v[:, :, lo:hi])
        assert_close(dq[:, :, lo:hi], dq_s, atol=1e-3, name=f"dq[{lo}:{hi}]")
        assert_close(dk[:, :, lo:hi], dk_s, atol=1e-3, name=f"dk[{lo}:{hi}]")
        assert_close(dv[:, :, lo:hi], dv_s, atol=1e-3, name=f"dv[{lo}:{hi}]")


def test_packed_grads_split_path():
    """Same check through the split (large-sequence) backward kernels."""
    import tiny_flash_attention_tpu.ops.flash_bwd as FB
    q, k, v, seg = make_packed(jax.random.key(2))

    def loss(q, k, v):
        out = flash_attention(q, k, v, causal=True,
                              segment_ids=(seg, seg), config=INTERP)
        return (out.astype(jnp.float32) ** 2).sum()

    limit = FB._FUSED_SCRATCH_LIMIT
    try:
        FB._FUSED_SCRATCH_LIMIT = 0
        d_split = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        FB._FUSED_SCRATCH_LIMIT = limit
    d_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), d_split, d_fused):
        assert_close(a, b, atol=1e-4, name=name)


def test_small_shape_xla_route_with_segments():
    """The tiny-shape XLA fallback applies the same segment semantics."""
    q, k, v, seg = make_packed(jax.random.key(3))
    got = flash_attention(q, k, v, causal=True, segment_ids=(seg, seg))
    want = flash_attention(q, k, v, causal=True, segment_ids=(seg, seg),
                           config=INTERP)
    assert_close(got, want, atol=1e-4, name="xla-vs-kernel")


def test_static_segment_starts_prune_worklist():
    """segment_starts prunes tiles entirely left of the q rows' segment;
    results must match the unpruned segment-masked kernel exactly, and the
    work list must actually shrink to ~sum(L_i^2)/2."""
    from tiny_flash_attention_tpu.ops.flash import _build_worklist

    L1, L2 = 512, 512
    L = L1 + L2
    kq, kk, kv = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(kq, (1, 2, L, D), jnp.float32)
    k = jax.random.normal(kk, (1, 2, L, D), jnp.float32)
    v = jax.random.normal(kv, (1, 2, L, D), jnp.float32)
    seg = jnp.asarray([[1] * L1 + [2] * L2], jnp.int32)
    base = flash_attention(q, k, v, causal=True, segment_ids=(seg, seg),
                           config=INTERP)
    pruned = flash_attention(q, k, v, causal=True, segment_ids=(seg, seg),
                             segment_starts=(0, L1), config=INTERP)
    assert_close(pruned, base, atol=1e-6, name="pruned == unpruned")

    qis_full, _, _ = _build_worklist(8, 8, 128, 128, L, L, True)
    qis_pruned, _, _ = _build_worklist(8, 8, 128, 128, L, L, True,
                                       segment_starts=(0, L1))
    # full causal: 36 tiles; block-diagonal: 2 * 10 = 20
    assert len(qis_full) == 36 and len(qis_pruned) == 20, (
        len(qis_full), len(qis_pruned))


def test_segment_starts_pruned_grads_match():
    """Gradients through the pruned work lists (fwd + all three bwd
    paths) must match the unpruned segment-masked gradients."""
    from tiny_flash_attention_tpu.ops.flash_bwd import (
        _build_bwd_worklist, _build_bwd_worklist_qmajor)

    L1, L2 = 256, 256
    L = L1 + L2
    kq, kk, kv = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(kq, (1, 2, L, D), jnp.float32)
    k = jax.random.normal(kk, (1, 2, L, D), jnp.float32)
    v = jax.random.normal(kv, (1, 2, L, D), jnp.float32)
    seg = jnp.asarray([[1] * L1 + [2] * L2], jnp.int32)

    def loss(starts):
        def f(q, k, v):
            o = flash_attention(q, k, v, causal=True,
                                segment_ids=(seg, seg),
                                segment_starts=starts, config=INTERP)
            w = jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape)
            return jnp.sum(o.astype(jnp.float32) * w) / o.size
        return f

    g0 = jax.grad(loss(None), argnums=(0, 1, 2))(q, k, v)
    g1 = jax.grad(loss((0, L1)), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g1, g0):
        assert_close(a, b, atol=1e-5, name=f"pruned {name}")

    # the bwd work lists actually shrink
    full = len(_build_bwd_worklist(4, 4, 128, 128, L, L, True, None)[0])
    pruned = len(_build_bwd_worklist(4, 4, 128, 128, L, L, True, None,
                                     segment_starts=(0, L1))[0])
    fullq = len(_build_bwd_worklist_qmajor(4, 4, 128, 128, L, L, True,
                                           None)[0])
    prunedq = len(_build_bwd_worklist_qmajor(
        4, 4, 128, 128, L, L, True, None, segment_starts=(0, L1))[0])
    assert pruned < full and prunedq < fullq, (pruned, full, prunedq, fullq)
