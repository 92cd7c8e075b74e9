"""Sharded serving decode (TP and DPxTP) vs the single-device loop."""

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
    temps = jnp.zeros((B,), jnp.float32)

    ref_pages, ref_tokens, _ = decode_loop(
        CFG, params, [p + 0 for p in pages0], tok0, pos0, table,
        temps, jax.random.key(1),
        page_size=ps, fmt="bf16", n_steps=steps, greedy=True)

    sharded = make_sharded_decode_loop(CFG, mesh, page_size=ps,
                                       fmt="bf16", n_steps=steps)
    got_pages, got_tokens = sharded(params, [p + 0 for p in pages0],
                                    tok0, pos0, table, temps,
                                    jax.random.key(1))

    np.testing.assert_array_equal(np.asarray(got_tokens),
                                  np.asarray(ref_tokens))
    for lp_ref, lp_got in zip(ref_pages, got_pages):
        np.testing.assert_allclose(np.asarray(lp_got, np.float32),
                                   np.asarray(lp_ref, np.float32),
                                   rtol=0, atol=1e-5)


def test_sharded_decode_sampled_matches_single_device():
    """Sampled (temperature > 0) decoding: the per-row key derivation must
    make the TP loop's stream identical to the single-device loop's."""
    params = T.init_params(CFG, jax.random.key(0))
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2),
                ("data", "model"))

    B, ps, pps, num_pages, steps = 2, 128, 4, 16, 8
    pages0 = [jnp.zeros((CFG.n_kv_heads, num_pages, 2 * ps, CFG.d_head),
                        CFG.dtype) for _ in range(CFG.n_layers)]
    table = jnp.asarray(
        np.arange(B * pps, dtype=np.int32).reshape(B, pps) + 1)
    tok0 = jnp.asarray([3, 77], jnp.int32)
    pos0 = jnp.zeros((B,), jnp.int32)
    temps = jnp.asarray([0.8, 1.3], jnp.float32)

    _, ref_tokens, _ = decode_loop(
        CFG, params, [p + 0 for p in pages0], tok0, pos0, table,
        temps, jax.random.key(5),
        page_size=ps, fmt="bf16", n_steps=steps, greedy=False)

    sharded = make_sharded_decode_loop(CFG, mesh, page_size=ps,
                                       fmt="bf16", n_steps=steps,
                                       greedy=False)
    _, got_tokens = sharded(params, [p + 0 for p in pages0],
                            tok0, pos0, table, temps, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(got_tokens),
                                  np.asarray(ref_tokens))


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


def test_dp_tp_engine_generate_matches_plain():
    """(data=2, model=2) mesh: independent page pools per data group, one
    host loop. Greedy AND sampled streams must match the single-chip
    engine token-for-token (per-row key derivation)."""
    from tiny_flash_attention_tpu.models.engine import InferenceEngine
    from tiny_flash_attention_tpu.parallel.serve import (
        ShardedInferenceEngine)

    params = T.init_params(CFG, jax.random.key(0))
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("data", "model"))
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(0, 256, size=n)) for n in (9, 40, 130, 17)]

    for temperature in (0.0, 0.9):
        plain = InferenceEngine(CFG, params, num_pages=32, page_size=128,
                                max_seqs=4, pages_per_seq=4)
        want = plain.generate(prompts, max_new_tokens=6,
                              temperature=temperature, chunk=6)

        dp = ShardedInferenceEngine(
            CFG, params, mesh, data_axis="data", num_pages=32,
            page_size=128, max_seqs=4, pages_per_seq=4)
        # slots and pages co-locate per data group
        assert dp.cache.n_groups == 2
        got = dp.generate(prompts, max_new_tokens=6,
                          temperature=temperature, chunk=6)
        assert got == want, (temperature, got, want)


def test_grouped_allocator_partitions_pages():
    """PagedKVCache n_groups: slots draw pages only from their own group's
    range; exhaustion in one group falls over to a slot in the other."""
    from tiny_flash_attention_tpu.models.kv_cache import PagedKVCache

    c = PagedKVCache.create(n_layers=1, n_kv_heads=1, num_pages=8,
                            page_size=128, d_head=128, max_seqs=4,
                            pages_per_seq=2, fmt="bf16", n_groups=2)
    s0 = c.alloc_slot(256)   # 2 pages
    assert c.group_of_slot(s0) == 0
    assert all(0 <= p < 4 for p in c.page_table[s0, :2])
    s1 = c.alloc_slot(256)
    assert c.group_of_slot(s1) == 0
    # group 0's 4 pages are gone; next allocation must land in group 1
    s2 = c.alloc_slot(256)
    assert c.group_of_slot(s2) == 1
    assert all(4 <= p < 8 for p in c.page_table[s2, :2])
    c.free_slot(s0)
    s3 = c.alloc_slot(128)
    assert c.group_of_slot(s3) == 0
    assert all(0 <= p < 4 for p in c.page_table[s3, :1])
