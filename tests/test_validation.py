"""Input-validation surface: bad inputs must fail with clear errors.

The reference guards its entry points with CHECK_INPUT/TORCH_CHECK macros
(attention_api.cuh:12-29, c/attn.cpp:239-241); here the public entries
assert the same class of contract (GQA divisibility, window preconditions,
shape agreement) before any tracing happens.
"""

import jax
import jax.numpy as jnp
import pytest

from tiny_flash_attention_tpu.ops.flash import flash_attention


def _qkv(hq=4, hkv=2, s=128, d=64):
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    return (jax.random.normal(kq, (1, hq, s, d)),
            jax.random.normal(kk, (1, hkv, s, d)),
            jax.random.normal(kv, (1, hkv, s, d)))


def test_gqa_divisibility_rejected():
    q, k, v = _qkv(hq=3, hkv=2)
    with pytest.raises(AssertionError, match="GQA"):
        flash_attention(q, k, v)


def test_window_requires_causal():
    q, k, v = _qkv()
    with pytest.raises(AssertionError, match="causal"):
        flash_attention(q, k, v, causal=False, window=16)


def test_window_must_be_positive():
    q, k, v = _qkv()
    with pytest.raises(AssertionError):
        flash_attention(q, k, v, causal=True, window=0)


def test_head_dim_mismatch_rejected():
    q, k, v = _qkv()
    with pytest.raises(Exception):
        flash_attention(q, k[..., :32], v)
