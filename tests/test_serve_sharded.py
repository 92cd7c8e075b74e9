"""Tensor-parallel sharded decode vs the single-device decode loop."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.models.inference import decode_loop
from tiny_flash_attention_tpu.parallel.serve import make_sharded_decode_loop

CFG = T.ModelConfig(
    vocab_size=256, d_model=128, n_layers=2, n_q_heads=4, n_kv_heads=2,
    d_head=128, d_ff=256, dtype=jnp.float32, attn_impl="flash")


def test_sharded_decode_matches_single_device():
    """Megatron-TP decode over the model axis (kv heads + pages sharded,
    psum after wo / w_down) must reproduce the single-device greedy decode
    token-for-token, with the cache pages ending identical."""
    params = T.init_params(CFG, jax.random.key(0))
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2),
                ("data", "model"))

    B, ps, pps, num_pages, steps = 2, 128, 4, 16, 10
    pages0 = [jnp.zeros((CFG.n_kv_heads, num_pages, 2 * ps, CFG.d_head),
                        CFG.dtype) for _ in range(CFG.n_layers)]
    table = jnp.asarray(
        np.arange(B * pps, dtype=np.int32).reshape(B, pps) + 1)
    tok0 = jnp.asarray([3, 77], jnp.int32)
    pos0 = jnp.zeros((B,), jnp.int32)

    ref_pages, ref_tokens, _ = decode_loop(
        CFG, params, [p + 0 for p in pages0], tok0, pos0, table,
        jnp.zeros((B,), jnp.float32), jax.random.key(1),
        page_size=ps, fmt="bf16", n_steps=steps, greedy=True)

    sharded = make_sharded_decode_loop(CFG, mesh, page_size=ps,
                                       fmt="bf16", n_steps=steps)
    got_pages, got_tokens = sharded(params, [p + 0 for p in pages0],
                                    tok0, pos0, table)

    np.testing.assert_array_equal(np.asarray(got_tokens),
                                  np.asarray(ref_tokens))
    for lp_ref, lp_got in zip(ref_pages, got_pages):
        np.testing.assert_allclose(np.asarray(lp_got, np.float32),
                                   np.asarray(lp_ref, np.float32),
                                   rtol=0, atol=1e-5)


def test_sharded_engine_generate_matches_plain():
    """The full serving loop (admission, paged cache, chunked decode,
    collection) with tensor-parallel decode must generate the same greedy
    tokens as the single-chip engine."""
    from tiny_flash_attention_tpu.models.engine import InferenceEngine
    from tiny_flash_attention_tpu.parallel.serve import (
        ShardedInferenceEngine)

    params = T.init_params(CFG, jax.random.key(0))
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2),
                ("data", "model"))
    rng = np.random.default_rng(31)
    prompts = [list(rng.integers(0, 256, size=n)) for n in (9, 40)]

    plain = InferenceEngine(CFG, params, num_pages=32, page_size=128,
                            max_seqs=2, pages_per_seq=4)
    want = plain.generate(prompts, max_new_tokens=8, chunk=8)

    sharded = ShardedInferenceEngine(CFG, params, mesh, num_pages=32,
                                     page_size=128, max_seqs=2,
                                     pages_per_seq=4)
    got = sharded.generate(prompts, max_new_tokens=8, chunk=8)
    assert got == want, (got, want)
