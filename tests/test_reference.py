"""Oracle-ladder tests for the pure-JAX algorithm tier.

Mirrors the reference's test strategy (SURVEY.md section 4): every softmax
variant and both flash loop orders must match the naive oracle at the
dtype-tiered tolerance; the ladder itself (main.py:95-99 asserts) is the test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.utils import assert_close, tolerance_for


def make_qkv(key, bs, hq, hkv, q_len, kv_len, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (bs, hq, q_len, d), dtype)
    k = jax.random.normal(kk, (bs, hkv, kv_len, d), dtype)
    v = jax.random.normal(kv, (bs, hkv, kv_len, d), dtype)
    return q, k, v


@pytest.mark.parametrize("impl", [
    R.attention_safe, R.attention_online,
    R.flash_attention_v1_ref, R.flash_attention_v2_ref,
])
@pytest.mark.parametrize("causal", [False, True])
def test_ladder_vs_naive(impl, causal):
    # Matches the reference's base shape (main.py:63 seqlen 128 d=64).
    key = jax.random.key(0)
    q, k, v = make_qkv(key, 2, 2, 2, 128, 128, 64)
    want = R.mha_reference(q, k, v, causal=causal, impl=R.attention_naive)
    got = R.mha_reference(q, k, v, causal=causal, impl=impl)
    assert_close(got, want, atol=tolerance_for(q.dtype), name=impl.__name__)


@pytest.mark.parametrize("q_len,kv_len", [(1, 128), (7, 128), (128, 64), (100, 200)])
def test_decode_shapes(q_len, kv_len):
    # q_len != kv_len decode shape (ref c/csrc/attn.cpp:51-53, c/test.py:8-19)
    key = jax.random.key(1)
    q, k, v = make_qkv(key, 1, 4, 4, q_len, kv_len, 64)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    got = R.mha_reference(q, k, v, causal=True, impl=R.flash_attention_v2_ref,
                          block_q=32, block_kv=32)
    assert_close(got, want, atol=tolerance_for(q.dtype))


def test_gqa_head_grouping():
    # 8 q heads share 2 kv heads (ref archive attn.cpp:29,61 gqa_group_size)
    key = jax.random.key(2)
    q, k, v = make_qkv(key, 2, 8, 2, 64, 64, 32)
    got = R.mha_reference(q, k, v, causal=True, impl=R.flash_attention_v2_ref)
    k_rep = jnp.repeat(k, 4, axis=1)
    v_rep = jnp.repeat(v, 4, axis=1)
    want = R.mha_reference(q, k_rep, v_rep, causal=True, impl=R.attention_naive)
    assert_close(got, want, atol=tolerance_for(q.dtype))


def test_sm_scale():
    key = jax.random.key(3)
    q, k, v = make_qkv(key, 1, 2, 2, 64, 64, 64)
    for scale in (1.0, 0.5, 0.125):
        want = R.mha_reference(q, k, v, sm_scale=scale, impl=R.attention_naive)
        got = R.mha_reference(q, k, v, sm_scale=scale,
                              impl=R.flash_attention_v2_ref)
        assert_close(got, want, atol=tolerance_for(q.dtype))


def test_lse_matches_direct():
    # LSE = logsumexp of scaled masked scores (ref triton :195-197 parity).
    key = jax.random.key(4)
    q, k, v = make_qkv(key, 1, 2, 2, 128, 128, 64)
    out, lse = R.mha_reference(q, k, v, causal=True,
                               impl=R.flash_attention_v2_ref, return_lse=True)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(64.0)
    mask = R._causal_mask(128, 128)
    s = jnp.where(mask, s, -jnp.inf)
    want = jax.nn.logsumexp(s, axis=-1)
    assert_close(lse, want, atol=1e-4, name="lse")


def test_bf16_inputs_fp32_accum():
    key = jax.random.key(5)
    q, k, v = make_qkv(key, 1, 2, 2, 128, 128, 64, dtype=jnp.bfloat16)
    want = R.mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32), impl=R.attention_naive)
    got = R.mha_reference(q, k, v, impl=R.flash_attention_v2_ref)
    assert_close(got, want, atol=tolerance_for(jnp.bfloat16))


def test_non_divisible_lengths():
    key = jax.random.key(6)
    q, k, v = make_qkv(key, 1, 2, 2, 100, 100, 64)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    got = R.mha_reference(q, k, v, causal=True, impl=R.flash_attention_v2_ref,
                          block_q=32, block_kv=32)
    assert_close(got, want, atol=tolerance_for(q.dtype))
