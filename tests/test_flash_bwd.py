"""Backward-pass tests: Pallas dq/dk/dv vs autodiff through the naive oracle."""

import functools

import jax
import jax.numpy as jnp
import pytest

from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.utils import assert_close

INTERP = FlashConfig(block_q=128, block_kv=128, interpret=True)


def make_qkv(key, bs, hq, hkv, q_len, kv_len, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (bs, hq, q_len, d), dtype),
            jax.random.normal(kk, (bs, hkv, kv_len, d), dtype),
            jax.random.normal(kv, (bs, hkv, kv_len, d), dtype))


def loss_of(attn, causal):
    def f(q, k, v):
        o = attn(q, k, v, causal=causal)
        # Weighted sum -> nontrivial cotangent
        w = jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape) / o.size
        return jnp.sum(o.astype(jnp.float32) * w)
    return f


@pytest.mark.parametrize("causal", [False, True])
def test_grads_vs_oracle(causal):
    key = jax.random.key(0)
    q, k, v = make_qkv(key, 1, 2, 2, 256, 256, 64)
    flash = functools.partial(flash_attention, config=INTERP)
    ref = functools.partial(R.mha_reference, impl=R.attention_naive)
    gf = jax.grad(loss_of(flash, causal), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_of(ref, causal), argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(gf, gr, "q k v".split()):
        assert_close(got, want, atol=2e-4, name=f"d{name}")


def test_grads_gqa():
    key = jax.random.key(1)
    q, k, v = make_qkv(key, 2, 8, 2, 128, 128, 64)
    flash = functools.partial(flash_attention, config=INTERP)
    ref = functools.partial(R.mha_reference, impl=R.attention_naive)
    gf = jax.grad(loss_of(flash, True), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_of(ref, True), argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(gf, gr, "q k v".split()):
        assert_close(got, want, atol=2e-4, name=f"d{name}")


def test_grads_decode_shape_and_padding():
    key = jax.random.key(2)
    q, k, v = make_qkv(key, 1, 2, 2, 100, 200, 80)
    flash = functools.partial(flash_attention, config=INTERP)
    ref = functools.partial(R.mha_reference, impl=R.attention_naive)
    gf = jax.grad(loss_of(flash, True), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_of(ref, True), argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(gf, gr, "q k v".split()):
        assert_close(got, want, atol=2e-4, name=f"d{name}")


def test_grads_bf16():
    key = jax.random.key(3)
    q, k, v = make_qkv(key, 1, 4, 4, 128, 128, 64, jnp.bfloat16)
    flash = functools.partial(flash_attention, config=INTERP)
    ref = functools.partial(R.mha_reference, impl=R.attention_naive)
    gf = jax.grad(loss_of(flash, True), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_of(ref, True), argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    for got, want, name in zip(gf, gr, "q k v".split()):
        assert_close(got.astype(jnp.float32), want, atol=3e-2, name=f"d{name}")


def test_split_path_matches_fused():
    """The large-sequence split kernels and the fused single-pass kernel
    must agree (the fused path covers seqs whose scratch fits VMEM)."""
    import tiny_flash_attention_tpu.ops.flash_bwd as FB
    key = jax.random.key(21)
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (1, 4, 256, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 256, 64), jnp.float32)
    out, lse = flash_attention(q, k, v, causal=True, return_lse=True,
                               config=INTERP)
    do = jax.random.normal(kd, out.shape, out.dtype)
    kw = dict(causal=True, sm_scale=0.125, block_q=128, block_kv=128,
              interpret=True)
    fused = FB.flash_attention_bwd(q, k, v, out, lse, do, **kw)
    limit = FB._FUSED_SCRATCH_LIMIT
    try:
        FB._FUSED_SCRATCH_LIMIT = 0   # force the split kernels
        split = FB.flash_attention_bwd(q, k, v, out, lse, do, **kw)
    finally:
        FB._FUSED_SCRATCH_LIMIT = limit
    for name, a, b in zip("dq dk dv".split(), fused, split):
        assert_close(a, b, atol=1e-4, name=name)
