"""Encoder family (models/encoder.py): the non-causal kernel's model
consumer. Oracle ladder per the reference pattern (SURVEY.md §4): the
flash path (Pallas, interpret on CPU) vs an explicit masked-softmax
oracle, plus the semantic invariant the segment masking exists for —
embeddings don't depend on how much padding a batch row carries."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.models import encoder as E
from tiny_flash_attention_tpu.models import transformer as T

CFG = T.ModelConfig(vocab_size=128, d_model=128, n_layers=2, n_q_heads=4,
                    n_kv_heads=2, d_head=64, d_ff=256, dtype=jnp.float32)


def _params():
    return T.init_params(CFG, jax.random.key(0))


def test_encoder_flash_matches_oracle():
    params = _params()
    tokens = jax.random.randint(jax.random.key(1), (2, 256), 0,
                                CFG.vocab_size)
    lengths = jnp.asarray([200, 256], jnp.int32)
    h_f, p_f = E.encode(CFG, params, tokens, lengths)
    cfg_ref = dataclasses.replace(CFG, attn_impl="reference")
    h_r, p_r = E.encode(cfg_ref, params, tokens, lengths)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_r),
                               atol=2e-4, rtol=0)
    # hidden states compared on VALID rows only (pad rows are sliced
    # away by callers; their values differ between pad-isolation and
    # explicit masking only in dead positions)
    np.testing.assert_allclose(np.asarray(h_f[0, :200], np.float32),
                               np.asarray(h_r[0, :200], np.float32),
                               atol=2e-4, rtol=0)


def test_embedding_pad_invariant():
    params = _params()
    L = 200
    body = jax.random.randint(jax.random.key(2), (1, L), 0, CFG.vocab_size)
    pad_a = jnp.concatenate(
        [body, jnp.full((1, 56), 7, jnp.int32)], axis=1)       # 256 total
    pad_b = jnp.concatenate(
        [body, jnp.full((1, 184), 13, jnp.int32)], axis=1)     # 384 total
    lengths = jnp.asarray([L], jnp.int32)
    e_a = E.embed_texts(CFG, params, pad_a, lengths)
    e_b = E.embed_texts(CFG, params, pad_b, lengths)
    np.testing.assert_allclose(np.asarray(e_a), np.asarray(e_b),
                               atol=1e-5, rtol=0)
    assert np.allclose(np.linalg.norm(np.asarray(e_a), axis=-1), 1.0,
                       atol=1e-5)


def test_encoder_batch_row_independence():
    """Rows of a batch must not leak into each other (the segment mask
    is per-row; a bug sharing ids ACROSS rows would show here)."""
    params = _params()
    t1 = jax.random.randint(jax.random.key(3), (1, 128), 0, CFG.vocab_size)
    t2 = jax.random.randint(jax.random.key(4), (1, 128), 0, CFG.vocab_size)
    both = jnp.concatenate([t1, t2], axis=0)
    e_both = E.embed_texts(CFG, params, both)
    e_solo = E.embed_texts(CFG, params, t1)
    np.testing.assert_allclose(np.asarray(e_both[0]), np.asarray(e_solo[0]),
                               atol=1e-5, rtol=0)
