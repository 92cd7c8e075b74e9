"""Pallas flash-attention forward vs pure-JAX oracle.

The kernel tier of the oracle ladder (SURVEY.md section 4): every config is
checked against attention_naive at the reference tolerance (atol 1e-2 for
bf16-class, tighter for fp32). Runs in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import pytest

from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.utils import assert_close, tolerance_for

INTERP = FlashConfig(block_q=128, block_kv=128, interpret=True)


def make_qkv(key, bs, hq, hkv, q_len, kv_len, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (bs, hq, q_len, d), dtype),
            jax.random.normal(kk, (bs, hkv, kv_len, d), dtype),
            jax.random.normal(kv, (bs, hkv, kv_len, d), dtype))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fwd_basic(causal, dtype):
    key = jax.random.key(0)
    q, k, v = make_qkv(key, 2, 4, 4, 256, 256, 64, dtype)
    want = R.mha_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=causal, impl=R.attention_naive)
    got = flash_attention(q, k, v, causal=causal, config=INTERP)
    assert_close(got, want, atol=tolerance_for(dtype))


def test_fwd_multiblock_kv():
    # Several KV tiles per Q tile: exercises the online rescale path.
    key = jax.random.key(1)
    q, k, v = make_qkv(key, 1, 2, 2, 128, 512, 64)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    got = flash_attention(q, k, v, causal=True, config=INTERP)
    assert_close(got, want, atol=tolerance_for(q.dtype))


def test_fwd_gqa():
    # 8 q heads / 2 kv heads routed via BlockSpec index maps.
    key = jax.random.key(2)
    q, k, v = make_qkv(key, 2, 8, 2, 128, 128, 64)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    got = flash_attention(q, k, v, causal=True, config=INTERP)
    assert_close(got, want, atol=tolerance_for(q.dtype))


def test_fwd_lse():
    key = jax.random.key(3)
    q, k, v = make_qkv(key, 1, 2, 2, 256, 256, 64)
    _, want_lse = R.mha_reference(q, k, v, causal=True,
                                  impl=R.flash_attention_v2_ref,
                                  return_lse=True)
    _, lse = flash_attention(q, k, v, causal=True, config=INTERP,
                             return_lse=True)
    assert_close(lse, want_lse, atol=1e-4, name="lse")


@pytest.mark.parametrize("q_len,kv_len", [(128, 384), (384, 128), (100, 300)])
def test_fwd_decode_shapes(q_len, kv_len):
    key = jax.random.key(4)
    q, k, v = make_qkv(key, 1, 2, 2, q_len, kv_len, 64)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    got = flash_attention(q, k, v, causal=True, config=INTERP)
    assert_close(got, want, atol=tolerance_for(q.dtype))


def test_fwd_nondivisible_and_headdim_pad():
    # seqlen 200 (pad+mask) and head_dim 80 (zero-pad to 128).
    key = jax.random.key(5)
    q, k, v = make_qkv(key, 1, 2, 2, 200, 200, 80)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    got = flash_attention(q, k, v, causal=True, config=INTERP)
    assert_close(got, want, atol=tolerance_for(q.dtype))


def test_fwd_sm_scale():
    key = jax.random.key(6)
    q, k, v = make_qkv(key, 1, 2, 2, 128, 128, 64)
    want = R.mha_reference(q, k, v, sm_scale=0.5, impl=R.attention_naive)
    got = flash_attention(q, k, v, sm_scale=0.5, config=INTERP)
    assert_close(got, want, atol=tolerance_for(q.dtype))


def test_fwd_single_row_decode():
    # q_len=1 decode against a long cache.
    key = jax.random.key(7)
    q, k, v = make_qkv(key, 2, 4, 4, 1, 512, 64)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    got = flash_attention(q, k, v, causal=True, config=INTERP)
    assert_close(got, want, atol=tolerance_for(q.dtype))


def test_fp16_surface():
    """fp16 inputs promote to fp32 compute (Mosaic has no f16 vector type)
    and return fp16, inside the reference's fp16 gate (atol 1e-2,
    flash_attention_py/main.py:95-99) vs the fp32 oracle."""
    kq, kk, kv = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(kq, (1, 4, 1024, 128), jnp.float16)
    k = jax.random.normal(kk, (1, 2, 1024, 128), jnp.float16)
    v = jax.random.normal(kv, (1, 2, 1024, 128), jnp.float16)
    got = flash_attention(q, k, v, causal=True)
    assert got.dtype == jnp.float16
    want = R.mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32), causal=True)
    import numpy as np
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0, atol=1e-2)


def test_extreme_logits_no_nan():
    """Huge-magnitude scores must not overflow the online softmax (exp2
    domain + finite mask value + empty-row guard)."""
    import numpy as np
    kq, kk, kv = jax.random.split(jax.random.key(13), 3)
    q = 1e4 * jax.random.normal(kq, (1, 2, 256, 64), jnp.float32)
    k = 1e4 * jax.random.normal(kk, (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 256, 64), jnp.float32)
    for causal in (False, True):
        got = flash_attention(q, k, v, causal=causal, config=INTERP)
        assert np.isfinite(np.asarray(got)).all(), f"NaN/Inf (causal={causal})"
        # rows are dominated by one key; output must be close to some v row
        assert float(jnp.abs(got).max()) < float(jnp.abs(v).max()) * 1.01


@pytest.mark.parametrize("causal", [False, True])
def test_flash_v1_kernel_matches_oracle(causal):
    """The FA1-loop-order Pallas kernel (KV-outer, persistent q state)
    matches the oracle — the loop-order pair of the reference's v1/v2."""
    import numpy as np
    from tiny_flash_attention_tpu.ops.flash_v1 import flash_attention_v1
    kq, kk, kv = jax.random.split(jax.random.key(17), 3)
    q = jax.random.normal(kq, (1, 2, 300, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 260, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 260, 64), jnp.float32)
    got, lse = flash_attention_v1(q, k, v, causal=causal, block_q=128,
                                  block_kv=128, return_lse=True,
                                  interpret=True)
    want, want_lse = R.mha_reference(
        q, k, v, causal=causal, impl=R.flash_attention_v2_ref,
        return_lse=True)
    assert_close(got, want, atol=1e-4, name="out")
    # fully-masked decode rows (q_len > kv_len, causal) carry an
    # implementation-defined sentinel; compare lse on valid rows only
    valid_from = max(0, q.shape[2] - k.shape[2]) if causal else 0
    assert_close(lse[:, :, valid_from:], want_lse[:, :, valid_from:],
                 atol=1e-4, name="lse")
