"""Paged decode attention vs oracle: scattered pages, varied lengths, int8."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.ops import quant as Q
from tiny_flash_attention_tpu.ops.paged import paged_decode_attention
from tiny_flash_attention_tpu.utils import assert_close

PAGE = 64


def build_paged_cache(key, batch, hkv, lengths, d, pages_per_seq,
                      dtype=jnp.float32, num_extra_pages=3, page=PAGE):
    """Builds contiguous K/V per sequence, scatters into shuffled pages."""
    kk, kv = jax.random.split(key)
    max_len = pages_per_seq * page
    k_full = jax.random.normal(kk, (batch, hkv, max_len, d), dtype)
    v_full = jax.random.normal(kv, (batch, hkv, max_len, d), dtype)

    num_pages = batch * pages_per_seq + num_extra_pages
    rng = np.random.default_rng(0)
    perm = rng.permutation(num_pages)[:batch * pages_per_seq]
    page_indices = perm.reshape(batch, pages_per_seq).astype(np.int32)

    k_pages = np.zeros((hkv, num_pages, page, d), dtype=np.float32)
    v_pages = np.zeros((hkv, num_pages, page, d), dtype=np.float32)
    kf = np.asarray(k_full, np.float32)
    vf = np.asarray(v_full, np.float32)
    for b in range(batch):
        for pi in range(pages_per_seq):
            dst = page_indices[b, pi]
            k_pages[:, dst] = kf[b, :, pi * page:(pi + 1) * page]
            v_pages[:, dst] = vf[b, :, pi * page:(pi + 1) * page]
    return (k_full, v_full, jnp.asarray(k_pages, dtype),
            jnp.asarray(v_pages, dtype), jnp.asarray(page_indices))


def oracle_decode(q, k_full, v_full, lengths):
    """Per-sequence naive attention against the first `length` cache rows."""
    outs = []
    for b in range(q.shape[0]):
        L = int(lengths[b])
        o = R.mha_reference(q[b:b + 1, :, None, :], k_full[b:b + 1, :, :L],
                            v_full[b:b + 1, :, :L], impl=R.attention_naive)
        outs.append(o[:, :, 0])
    return jnp.concatenate(outs, axis=0)


@pytest.mark.parametrize("lengths", [[256, 256], [64, 200], [1, 511]])
def test_paged_decode_fp32(lengths):
    batch, hkv, hq, d, pps = len(lengths), 2, 8, 64, 8
    key = jax.random.key(0)
    k_full, v_full, k_pages, v_pages, page_indices = build_paged_cache(
        key, batch, hkv, lengths, d, pps)
    q = jax.random.normal(jax.random.key(1), (batch, hq, d), jnp.float32)
    lengths_a = jnp.asarray(lengths, jnp.int32)
    out, lse = paged_decode_attention(q, k_pages, v_pages, lengths_a,
                                      page_indices, pages_per_block=2)
    k_rep = jnp.repeat(k_full, hq // hkv, axis=1)
    v_rep = jnp.repeat(v_full, hq // hkv, axis=1)
    want = oracle_decode(q, k_rep, v_rep, lengths)
    assert_close(out, want, atol=1e-5)


def test_paged_decode_int8():
    # page_size=128: quantized pages require 128-lane-aligned scale rows
    batch, hkv, hq, d, pps = 2, 2, 8, 64, 4
    lengths = [300, 512]
    key = jax.random.key(2)
    k_full, v_full, k_pages, v_pages, page_indices = build_paged_cache(
        key, batch, hkv, lengths, d, pps, page=128)
    kq8 = Q.quantize_int8(k_pages, axis=-1)
    vq8 = Q.quantize_int8(v_pages, axis=-1)
    q = jax.random.normal(jax.random.key(3), (batch, hq, d), jnp.float32)
    lengths_a = jnp.asarray(lengths, jnp.int32)
    out, _ = paged_decode_attention(q, kq8, vq8, lengths_a, page_indices,
                                    pages_per_block=2)
    # kernel-exact oracle: dequantized pages gathered back to contiguous
    kd = kq8.dequantize()
    vd = vq8.dequantize()
    k_full_dq = jnp.stack([
        jnp.concatenate([kd[:, page_indices[b, pi]] for pi in range(pps)],
                        axis=1) for b in range(batch)])
    v_full_dq = jnp.stack([
        jnp.concatenate([vd[:, page_indices[b, pi]] for pi in range(pps)],
                        axis=1) for b in range(batch)])
    k_rep = jnp.repeat(k_full_dq, hq // hkv, axis=1)
    v_rep = jnp.repeat(v_full_dq, hq // hkv, axis=1)
    want = oracle_decode(q, k_rep, v_rep, lengths)
    assert_close(out, want, atol=1e-4, name="int8 paged kernel-exact")


def test_paged_decode_bf16_and_lse():
    batch, hkv, hq, d, pps = 2, 4, 4, 128, 4
    lengths = [128, 256]
    key = jax.random.key(4)
    k_full, v_full, k_pages, v_pages, page_indices = build_paged_cache(
        key, batch, hkv, lengths, d, pps, dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.key(5), (batch, hq, d), jnp.bfloat16)
    lengths_a = jnp.asarray(lengths, jnp.int32)
    out, lse = paged_decode_attention(q, k_pages, v_pages, lengths_a,
                                      page_indices, pages_per_block=2)
    want = oracle_decode(q.astype(jnp.float32), k_full.astype(jnp.float32),
                         v_full.astype(jnp.float32), lengths)
    assert_close(out, want, atol=2e-2)
    assert lse.shape == (batch, hq)
    assert not bool(jnp.isnan(lse).any())
