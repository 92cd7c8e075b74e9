"""Native C++ CPU oracle vs the pure-JAX ladder (ref c/test.py:34-92)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_flash_attention_tpu import cpu
from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.utils import assert_close


def make_qkv(seed, bs, hq, hkv, q_len, kv_len, d):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((bs, hq, q_len, d), np.float32),
            rng.standard_normal((bs, hkv, kv_len, d), np.float32),
            rng.standard_normal((bs, hkv, kv_len, d), np.float32))


def test_simd_path_compiled():
    assert cpu.simd_width() in (1, 8, 16)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("fn", [cpu.naive_attn, cpu.flash_attn])
def test_native_vs_jax_oracle(fn, causal):
    # Reference CPU test shape: bs=3 head=32 seq=128 d=128 fp32 causal
    # scaled down for the 1-core CI box (c/test.py:37-42).
    q, k, v = make_qkv(0, 2, 4, 4, 64, 64, 64)
    want = R.mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           causal=causal, impl=R.attention_naive)
    got = fn(q, k, v, causal=causal)
    assert_close(got, want, atol=1e-5, name=fn.__name__)


def test_native_gqa_decode_shape():
    # decode shape q_len != kv_len + GQA together (c/test.py:8-19 + archive)
    q, k, v = make_qkv(1, 1, 8, 2, 5, 96, 64)
    want = R.mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           causal=True, impl=R.attention_naive)
    got = cpu.flash_attn(q, k, v, causal=True)
    assert_close(got, want, atol=1e-5)


def test_native_lse():
    q, k, v = make_qkv(2, 1, 2, 2, 32, 32, 32)
    _, want_lse = R.mha_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True,
        impl=R.flash_attention_v2_ref, return_lse=True)
    _, lse = cpu.flash_attn(q, k, v, causal=True, return_lse=True)
    assert_close(lse, want_lse, atol=1e-4, name="lse")


def test_native_bf16():
    q, k, v = make_qkv(3, 1, 2, 2, 64, 64, 64)
    qb = jnp.asarray(q, jnp.bfloat16)
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    want = R.mha_reference(qb, kb, vb, causal=True, impl=R.attention_naive)
    got = cpu.flash_attn_bf16(np.asarray(qb), np.asarray(kb), np.asarray(vb),
                              causal=True)
    assert_close(got.astype(np.float32), want, atol=2e-2)


def test_native_fp16():
    q, k, v = make_qkv(5, 1, 2, 2, 64, 64, 64)
    qh, kh, vh = (x.astype(np.float16) for x in (q, k, v))
    want = R.mha_reference(jnp.asarray(qh), jnp.asarray(kh), jnp.asarray(vh),
                           causal=True, impl=R.attention_naive)
    got = cpu.flash_attn_fp16(qh, kh, vh, causal=True)
    assert got.dtype == np.float16
    assert_close(got.astype(np.float32), want, atol=1e-2)


def test_fp16_conversions_bit_exact():
    """fp16<->f32 conversions match IEEE semantics exactly (all 65536 load
    patterns; RNE store incl. subnormals/overflow/signed zero)."""
    import ctypes
    lib = cpu._load()
    u16p = ctypes.POINTER(ctypes.c_uint16)
    f32p = ctypes.POINTER(ctypes.c_float)
    src = np.arange(65536, dtype=np.uint16)
    dst = np.empty(65536, np.float32)
    lib.fp16_to_f32(src.ctypes.data_as(u16p), dst.ctypes.data_as(f32p), 65536)
    want = src.view(np.float16).astype(np.float32)
    assert ((dst == want) | (np.isnan(dst) & np.isnan(want))).all()

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.normal(0, 1, 50000), rng.normal(0, 1e-6, 20000),
        rng.normal(0, 1e5, 20000),
        [0.0, -0.0, np.inf, -np.inf, np.nan, 65504.0, 65520.0,
         2.0**-24, 2.0**-25, 1.5 * 2.0**-25, -(2.0**-14)],
    ]).astype(np.float32)
    out = np.empty(vals.size, np.uint16)
    lib.f32_to_fp16(vals.ctypes.data_as(f32p), out.ctypes.data_as(u16p),
                    vals.size)
    with np.errstate(over="ignore"):
        want16 = vals.astype(np.float16).view(np.uint16)
    nan = np.isnan(vals)
    assert (out[~nan] == want16[~nan]).all()
    assert np.isnan(out[nan].view(np.float16)).all()


def test_native_sm_scale():
    q, k, v = make_qkv(4, 1, 2, 2, 32, 32, 64)
    want = R.mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           sm_scale=0.25, impl=R.attention_naive)
    got = cpu.flash_attn(q, k, v, sm_scale=0.25)
    assert_close(got, want, atol=1e-5)
