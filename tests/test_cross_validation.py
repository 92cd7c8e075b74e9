"""Cross-validation vs an independent production implementation.

The reference validates every tier against both a naive oracle AND the
official `flash_attn` package (main.py:82, cutlass/test.py:75-81,
c/test.py:67 — the "cross-validation ladder", SURVEY.md section 4.3). The
JAX-ecosystem analog of that independent implementation is
`jax.nn.dot_product_attention`: it shares no code with this framework's
kernels or its pure-JAX oracle, so agreement here rules out a common-mode
error in our own reference implementations.
"""

import math

import jax
import jax.numpy as jnp
import pytest

from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.utils import assert_close

INTERP = FlashConfig(block_q=128, block_kv=128, interpret=True)


def _qkv(seed, bs, hq, hkv, s, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(kq, (bs, hq, s, d), dtype)
    k = jax.random.normal(kk, (bs, hkv, s, d), dtype)
    v = jax.random.normal(kv, (bs, hkv, s, d), dtype)
    return q, k, v


def _stock(q, k, v, *, causal, window=None):
    """jax.nn.dot_product_attention with our (bs, heads, seq, d) layout and
    our window convention (window = total left-inclusive span incl. self)."""
    lw = None if window is None else (window - 1, 0)
    out = jax.nn.dot_product_attention(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
        scale=1.0 / math.sqrt(q.shape[-1]), is_causal=causal,
        local_window_size=lw)
    return out.swapaxes(1, 2)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hq,hkv", [(2, 2), (4, 2)])
def test_kernel_vs_stock_jax(causal, hq, hkv):
    q, k, v = _qkv(0, 1, hq, hkv, 256, 64)
    got = flash_attention(q, k, v, causal=causal, config=INTERP)
    want = _stock(q, k, v, causal=causal)
    assert_close(got, want, atol=2e-4, name="kernel-vs-stock")


def test_kernel_vs_stock_jax_window():
    q, k, v = _qkv(1, 1, 2, 2, 384, 64)
    got = flash_attention(q, k, v, causal=True, window=100, config=INTERP)
    want = _stock(q, k, v, causal=True, window=100)
    assert_close(got, want, atol=2e-4, name="kernel-vs-stock-window")


@pytest.mark.parametrize("impl", [
    R.attention_naive, R.attention_online, R.flash_attention_v2_ref,
])
def test_oracle_ladder_vs_stock_jax(impl):
    """Our own oracle tier must also agree with the independent impl —
    guards against a common-mode bug shared by oracle and kernel. The ladder
    impls are single-head (seq, d); lift over (bs, head) with vmap exactly as
    the reference's multihead wrapper batches v2 (tiny_flash_attn.py:137)."""
    q, k, v = _qkv(2, 2, 2, 2, 128, 64)
    want = _stock(q, k, v, causal=True)
    got = jax.vmap(jax.vmap(lambda q, k, v: impl(q, k, v, causal=True)))(
        q, k, v)
    assert_close(got, want, atol=2e-4, name="oracle-vs-stock")
