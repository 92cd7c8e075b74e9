"""Quantization tests: round-trip accuracy, weight-only matmul, fused-dequant
attention vs the fp32 oracle (accuracy gate = reference-style atol ladder,
SURVEY.md section 7 step 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.ops import quant as Q
from tiny_flash_attention_tpu.ops.flash_quant import flash_attention_quantized
from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.utils import assert_close

INTERP = FlashConfig(block_q=128, block_kv=128, interpret=True)


def test_int8_roundtrip():
    x = jax.random.normal(jax.random.key(0), (64, 128), jnp.float32)
    qt = Q.quantize_int8(x)
    err = jnp.max(jnp.abs(qt.dequantize() - x))
    # symmetric int8: worst case ~ amax/127/2 per row
    assert err < jnp.max(jnp.abs(x)) / 127.0, err


def test_int8_per_block_scales():
    x = jax.random.normal(jax.random.key(1), (64, 256), jnp.float32)
    # one outlier per row stresses coarse scales; block=128 localizes it
    x = x.at[:, 0].set(50.0)
    qt_row = Q.quantize_int8(x, axis=-1)
    qt_blk = Q.quantize_int8(x, axis=-1, block=128)
    err_row = jnp.max(jnp.abs(qt_row.dequantize()[:, 128:] - x[:, 128:]))
    err_blk = jnp.max(jnp.abs(qt_blk.dequantize()[:, 128:] - x[:, 128:]))
    assert err_blk < err_row  # block scales isolate the outlier


def test_fp8_roundtrip():
    x = jax.random.normal(jax.random.key(2), (64, 128), jnp.float32)
    qt = Q.quantize_fp8(x)
    rel = jnp.max(jnp.abs(qt.dequantize() - x) / (jnp.abs(x) + 1e-6))
    assert rel < 0.07, rel  # e4m3: 3 mantissa bits ~ 6% worst-case rel err


def test_weight_only_matmul():
    key = jax.random.key(3)
    x = jax.random.normal(key, (32, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(4), (256, 512), jnp.float32)
    qw = Q.quantize_weight(w, "int8")
    got = Q.quantized_matmul(x, qw, out_dtype=jnp.float32)
    want = x.astype(jnp.float32) @ w
    # int8 weight error ~ 0.4% relative; column norms ~ sqrt(256)
    assert_close(got, want, atol=0.7, name="int8 matmul")


@pytest.mark.parametrize("fmt,atol", [("int8", 2.5e-2), ("fp8", 1.2e-1)])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_dequant_attention(fmt, atol, causal):
    key = jax.random.key(5)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 4, 256, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 4, 256, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 4, 256, 64), jnp.float32)
    kq_, vq_ = Q.quantize_kv(k, v, fmt)
    got = flash_attention_quantized(q, kq_, vq_, causal=causal, config=INTERP)
    want = R.mha_reference(q, k, v, causal=causal, impl=R.attention_naive)
    assert_close(got, want, atol=atol, name=f"{fmt} attn")
    # and exact vs a dequantized-input oracle (isolates kernel error from
    # quantization error)
    want_dq = R.mha_reference(q, kq_.dequantize(), vq_.dequantize(),
                              causal=causal, impl=R.attention_naive)
    assert_close(got, want_dq, atol=1e-4, name=f"{fmt} kernel-exact")


def test_fused_dequant_gqa_decode():
    key = jax.random.key(6)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 8, 1, 64), jnp.bfloat16)
    k = jax.random.normal(kk, (2, 2, 512, 64), jnp.bfloat16)
    v = jax.random.normal(kv, (2, 2, 512, 64), jnp.bfloat16)
    kq_, vq_ = Q.quantize_kv(k, v, "int8")
    got = flash_attention_quantized(q, kq_, vq_, causal=True, config=INTERP)
    want = R.mha_reference(
        q.astype(jnp.float32), kq_.dequantize(), vq_.dequantize(),
        causal=True, impl=R.attention_naive)
    assert_close(got, want, atol=2e-2, name="int8 gqa decode")


@pytest.mark.parametrize("fmt", ["int8", "fp8"])
def test_quant_attention_sliding_window(fmt):
    """The quant tier inherits sliding windows from the unified work-list
    forward (VERDICT round-1 item 2)."""
    key = jax.random.key(8)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 512, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 512, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 512, 64), jnp.float32)
    kq_, vq_ = Q.quantize_kv(k, v, fmt)
    got = flash_attention_quantized(q, kq_, vq_, causal=True, window=128,
                                    config=INTERP)
    from tiny_flash_attention_tpu.ops.flash import _xla_attention
    want = _xla_attention(q, kq_.dequantize(), vq_.dequantize(), None,
                          True, 1.0 / np.sqrt(64), False, window=128)
    assert_close(got, want, atol=1e-4, name=f"{fmt} window kernel-exact")


def test_quant_attention_segments():
    """Packed sequences through the quant tier: only same-id pairs attend."""
    key = jax.random.key(9)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 384, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 384, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 384, 64), jnp.float32)
    seg = jnp.asarray([[1] * 200 + [2] * 184], jnp.int32)
    kq_, vq_ = Q.quantize_kv(k, v, "int8")
    got = flash_attention_quantized(q, kq_, vq_, causal=True,
                                    segment_ids=(seg, seg), config=INTERP)
    from tiny_flash_attention_tpu.ops.flash import _xla_attention
    want = _xla_attention(q, kq_.dequantize(), vq_.dequantize(),
                          (seg, seg), True, 1.0 / np.sqrt(64), False)
    assert_close(got, want, atol=1e-4, name="int8 segments kernel-exact")


def test_quantized_matmul_pallas_matches_xla():
    """The decode-shaped Pallas streaming matmul must match the XLA path."""
    from tiny_flash_attention_tpu.ops.quant_matmul import (
        quantized_matmul_pallas)
    x = jax.random.normal(jax.random.key(0), (8, 512), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (512, 768), jnp.bfloat16)
    qw = Q.quantize_weight(w, "int8")
    got = quantized_matmul_pallas(x, qw, block_k=256, block_n=256)
    acc = jnp.dot(x, qw.values.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    want = (acc * qw.scales.astype(jnp.float32)).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=1e-1)
