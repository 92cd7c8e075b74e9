"""Sliding-window (local) attention: fwd + grads vs a masked oracle, and
the work-list economy (band-only tiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_flash_attention_tpu.ops.flash import (
    flash_attention, _build_worklist)
from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.utils import assert_close

INTERP = FlashConfig(block_q=128, block_kv=128, interpret=True)


def oracle(q, k, v, window, sm_scale=None):
    if sm_scale is None:
        sm_scale = 1.0 / np.sqrt(q.shape[-1])
    group = q.shape[1] // k.shape[1]
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    ql, kl = q.shape[2], k.shape[2]
    pos = jnp.arange(ql)[:, None] + (kl - ql)
    col = jnp.arange(kl)[None, :]
    valid = (col <= pos) & (col >= pos - window + 1)
    s = jnp.where(valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("window", [64, 200, 1000])
def test_window_fwd_matches_oracle(window):
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (1, 4, 640, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 640, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 640, 64), jnp.float32)
    got = flash_attention(q, k, v, causal=True, window=window, config=INTERP)
    want = oracle(q, k, v, window)
    assert_close(got, want, atol=1e-4, name=f"window={window}")


def test_window_grads_match_oracle():
    kq, kk, kv = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(kq, (1, 2, 384, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 384, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 384, 64), jnp.float32)
    w = 150

    def loss(fn):
        return lambda q, k, v: (fn(q, k, v).astype(jnp.float32) ** 2).sum()

    g1 = jax.grad(loss(lambda q, k, v: flash_attention(
        q, k, v, causal=True, window=w, config=INTERP)),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(lambda q, k, v: oracle(q, k, v, w)),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g1, g2):
        assert_close(a, b, atol=1e-3, name=name)


def test_window_worklist_is_band_only():
    """At seq >> window, the work list enumerates O(seq*window) tiles, not
    O(seq^2/2) — the SWA economics the grid design buys."""
    n = 64  # 64 blocks of 128 = 8192 tokens
    qis, kvis, flags = _build_worklist(n, n, 128, 128, n * 128, n * 128,
                                       causal=True, window=256)
    # each q block sees at most ceil(window/bkv)+1 = 3 kv tiles
    assert len(qis) <= 3 * n, len(qis)
    full, _, _ = _build_worklist(n, n, 128, 128, n * 128, n * 128,
                                 causal=True)
    assert len(full) == n * (n + 1) // 2


def test_window_decode_shape():
    """Decode shape (q_len < kv_len) with a window: only the last `window`
    cache entries matter."""
    kq, kk, kv = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(kq, (1, 2, 1, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 512, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 512, 64), jnp.float32)
    got = flash_attention(q, k, v, causal=True, window=128, config=INTERP)
    want = oracle(q, k, v, 128)
    assert_close(got, want, atol=1e-4, name="decode-window")


def test_window_with_segments():
    """Sliding window and packed segments compose."""
    kq, kk, kv = jax.random.split(jax.random.key(3), 3)
    L1, L2 = 150, 106
    L = L1 + L2
    q = jax.random.normal(kq, (1, 4, L, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, L, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, L, 64), jnp.float32)
    seg = jnp.asarray([[1] * L1 + [2] * L2], jnp.int32)
    w = 80
    got = flash_attention(q, k, v, causal=True, window=w,
                          segment_ids=(seg, seg), config=INTERP)
    for lo, hi in ((0, L1), (L1, L)):
        want = flash_attention(q[:, :, lo:hi], k[:, :, lo:hi],
                               v[:, :, lo:hi], causal=True, window=w,
                               config=INTERP)
        assert_close(got[:, :, lo:hi], want, atol=1e-4,
                     name=f"win+seg[{lo}:{hi}]")


def test_window_grads_cross_length():
    """Windowed backward with kv history (q_len < kv_len): grads match the
    masked oracle where defined. (The zeros of dk/dv blocks outside the
    band are validated on hardware — interpret mode zero-fills outputs and
    cannot distinguish an unwritten block from a written zero.)"""
    kq, kk, kv, kd = jax.random.split(jax.random.key(5), 4)
    q = jax.random.normal(kq, (1, 2, 128, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 512, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 512, 64), jnp.float32)
    w = 100

    def loss(fn):
        return lambda q, k, v: (fn(q, k, v).astype(jnp.float32) ** 2).sum()

    g1 = jax.grad(loss(lambda q, k, v: flash_attention(
        q, k, v, causal=True, window=w, config=INTERP)),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(lambda q, k, v: oracle(q, k, v, w)),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g1, g2):
        assert_close(a, b, atol=1e-3, name=name)
