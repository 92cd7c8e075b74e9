"""Cross-feature fuzz: random shape/feature combinations vs a dense oracle.

Each individual feature (causal, decode shapes, GQA, window, segments,
padding) has targeted tests; this sweep exercises their *combinations*,
which is where tiling/masking interactions hide (the reference's analog is
the cross-validation ladder, SURVEY.md section 4). Runs in interpret mode
with forced multi-block geometry so every boundary path executes.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.utils import assert_close

INTERP = FlashConfig(block_q=128, block_kv=128, interpret=True)


def dense_oracle(q, k, v, *, causal, window, segs, sm_scale=None):
    """Dense-mask attention with kernel-identical semantics: GQA, decode
    offset, sliding window, segment ids, empty rows -> zeros."""
    bs, hq, q_len, d = q.shape
    hkv, kv_len = k.shape[1], k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    group = hq // hkv
    k = jnp.repeat(k, group, axis=1)
    v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    qpos = jnp.arange(q_len)[:, None] + (kv_len - q_len)
    kpos = jnp.arange(kv_len)[None, :]
    mask = jnp.ones((q_len, kv_len), bool)
    if causal:
        mask &= kpos <= qpos
    if window is not None:
        mask &= kpos > qpos - window
    mask = mask[None, None]
    if segs is not None:
        qs, ks = segs
        mask &= (qs[:, None, :, None] == ks[:, None, None, :])
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(s - m))
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(l == 0.0, 1.0, l)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


# (seed, bs, hq, hkv, q_len, kv_len, d, causal, window, with_segments)
CASES = [
    (0, 1, 2, 2, 256, 256, 64, True, None, False),     # aligned causal
    (1, 2, 4, 2, 200, 520, 64, True, None, False),     # GQA + unaligned decode
    (2, 1, 2, 1, 384, 384, 80, True, 150, False),      # window + odd head dim
    (3, 1, 3, 3, 300, 300, 64, True, None, True),      # segments + unaligned
    (4, 1, 4, 2, 130, 640, 128, True, 200, True),      # everything at once
    (5, 1, 2, 2, 256, 512, 64, False, None, True),     # non-causal segments
    (6, 1, 2, 2, 640, 384, 64, True, None, False),     # q_len > kv_len (dead rows)
]


def _make(seed, bs, hq, hkv, q_len, kv_len, d, with_segments):
    kq, kk, kv, ks = jax.random.split(jax.random.key(seed), 4)
    q = jax.random.normal(kq, (bs, hq, q_len, d), jnp.float32)
    k = jax.random.normal(kk, (bs, hkv, kv_len, d), jnp.float32)
    v = jax.random.normal(kv, (bs, hkv, kv_len, d), jnp.float32)
    segs = None
    if with_segments:
        # random nondecreasing ids over the longer axis, shared prefix for q
        rng = np.random.default_rng(seed)
        bounds = np.sort(rng.choice(np.arange(1, kv_len), 3, replace=False))
        kv_seg = np.searchsorted(bounds, np.arange(kv_len), side="right")
        kv_seg = np.tile(kv_seg[None], (bs, 1)).astype(np.int32)
        q_seg = kv_seg[:, kv_len - q_len:] if q_len <= kv_len else \
            np.pad(kv_seg, ((0, 0), (q_len - kv_len, 0)), mode="edge")
        segs = (jnp.asarray(q_seg), jnp.asarray(kv_seg))
    return q, k, v, segs


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"seed{c[0]}")
def test_fuzz_fwd_and_grads(case):
    seed, bs, hq, hkv, q_len, kv_len, d, causal, window, with_seg = case
    q, k, v, segs = _make(seed, bs, hq, hkv, q_len, kv_len, d, with_seg)

    def run_kernel(q, k, v):
        return flash_attention(q, k, v, causal=causal, window=window,
                               segment_ids=segs, config=INTERP)

    def run_oracle(q, k, v):
        return dense_oracle(q, k, v, causal=causal, window=window, segs=segs)

    got = run_kernel(q, k, v)
    want = run_oracle(q, k, v)
    assert_close(got, want, atol=2e-4, name=f"fwd seed{seed}")

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v).astype(jnp.float32)
            w = jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape)
            return jnp.sum(o * w) / o.size
        return f

    g1 = jax.grad(loss(run_kernel), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(run_oracle), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g1, g2):
        assert_close(a, b, atol=2e-3, name=f"{name} seed{seed}")


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"seed{c[0]}")
def test_fuzz_quantized_fwd(case):
    """The unified quant forward (round 2) must track the same feature
    combinations; gated vs the DEQUANTIZED oracle so the sweep measures
    kernel error, not int8 noise."""
    from tiny_flash_attention_tpu.ops.quant import quantize_kv
    from tiny_flash_attention_tpu.ops.flash_quant import (
        flash_attention_quantized)

    seed, bs, hq, hkv, q_len, kv_len, d, causal, window, with_seg = case
    if window is not None and not causal:
        pytest.skip("window requires causal")
    q, k, v, segs = _make(seed, bs, hq, hkv, q_len, kv_len, d, with_seg)
    kq_, vq_ = quantize_kv(k, v, "int8")
    got = flash_attention_quantized(
        q, kq_, vq_, causal=causal, window=window, segment_ids=segs,
        config=INTERP)
    want = dense_oracle(q, kq_.dequantize(), vq_.dequantize(),
                        causal=causal, window=window, segs=segs)
    assert_close(got, want, atol=2e-4, name=f"quant fwd seed{seed}")
