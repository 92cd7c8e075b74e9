"""Aux subsystems: KV-cache checkpoint/resume, roofline accounting, tracing.

The reference persists nothing and observes through prints (SURVEY.md
section 5); these cover the TPU-native replacements.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_flash_attention_tpu.models.kv_cache import PagedKVCache
from tiny_flash_attention_tpu.utils.profiling import roofline, trace


@pytest.mark.parametrize("fmt", ["bf16", "int8"])
def test_kv_cache_save_restore_roundtrip(tmp_path, fmt):
    cache = PagedKVCache.create(
        n_layers=2, n_kv_heads=2, num_pages=16, page_size=128, d_head=128,
        max_seqs=4, pages_per_seq=4, fmt=fmt)
    slot = cache.alloc_slot(128)
    k = jax.random.normal(jax.random.key(0), (2, 2, 3, 128), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(1), (2, 2, 3, 128), jnp.bfloat16)
    for t in range(3):
        cache.append_tokens(np.asarray([slot]), k[:, :, t:t + 1, :],
                            v[:, :, t:t + 1, :])

    path = str(tmp_path / "cache.npz")
    cache.save(path)
    restored = PagedKVCache.load(path)

    assert restored.fmt == cache.fmt
    assert restored.page_size == cache.page_size
    assert restored.free_pages == cache.free_pages
    np.testing.assert_array_equal(restored.page_table, cache.page_table)
    np.testing.assert_array_equal(restored.lengths, cache.lengths)
    for a, b in zip(restored.pages, cache.pages):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume: the restored cache keeps serving (append another token)
    restored.append_tokens(np.asarray([slot]), k[:, :, :1, :], v[:, :, :1, :])
    assert int(restored.lengths[slot]) == 4


def test_roofline_classification():
    # attention-like: high intensity -> compute bound
    r = roofline(flops=10**12, bytes_accessed=10**9, seconds=0.01)
    assert r.bound == "compute"
    assert abs(r.achieved_tflops - 100.0) < 1e-6
    # decode-like: one flop per byte -> memory bound
    r2 = roofline(flops=10**9, bytes_accessed=10**9, seconds=0.01)
    assert r2.bound == "memory"
    assert abs(r2.achieved_gbs - 100.0) < 1e-6
    assert "bound" in str(r2)


def test_trace_smoke(tmp_path):
    with trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert any(tmp_path.iterdir()), "trace produced no files"


def test_count_flops_matmul():
    """XLA's cost model must report the analytic 2*M*N*K for a plain matmul
    (the FlopCounterMode parity check, ref main_torch_only.py:292-302)."""
    from tiny_flash_attention_tpu.utils.profiling import count_flops
    a = jnp.zeros((128, 256), jnp.float32)
    b = jnp.zeros((256, 64), jnp.float32)
    got = count_flops(lambda a, b: a @ b, a, b)
    assert got["flops"] == pytest.approx(2 * 128 * 256 * 64, rel=0.01)
    assert got["bytes_accessed"] > 0


def test_autotune_flash_config(tmp_path):
    """Measured autotune returns a runnable config, memoizes, and
    round-trips through the persisted cache."""
    from tiny_flash_attention_tpu.utils import autotune as AT
    from tiny_flash_attention_tpu.ops.flash import flash_attention
    from tiny_flash_attention_tpu.ops import reference as R
    from tiny_flash_attention_tpu.utils import assert_close

    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (1, 2, 256, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 256, 64), jnp.float32)
    cands = [AT.FlashConfig(block_q=128, block_kv=128, interpret=True),
             AT.FlashConfig(block_q=256, block_kv=256, interpret=True)]
    cfg = AT.autotune_flash_config(q, k, v, causal=True, rounds=1,
                                   candidates=cands)
    assert cfg in cands
    # memoized
    assert AT.autotune_flash_config(q, k, v, causal=True) is cfg
    # the winner actually runs and is correct
    got = flash_attention(q, k, v, causal=True, config=cfg)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    assert_close(got, want, atol=2e-5, name="autotuned")
    # persistence round-trip
    path = str(tmp_path / "tune.json")
    AT.save_cache(path)
    AT._CACHE.clear()
    assert AT.load_cache(path) >= 1
    cfg2 = AT.autotune_flash_config(q, k, v, causal=True)
    assert (cfg2.block_q, cfg2.block_kv) == (cfg.block_q, cfg.block_kv)


def test_autotune_candidates_cover_tri_family():
    """The default candidate set sweeps the triangle kernels exactly when
    they are eligible (one-shot for mid S, banded for long S), and the
    persisted-cache schema round-trips the kernel family."""
    from tiny_flash_attention_tpu.utils import autotune as AT

    base = AT.default_config(jnp.bfloat16, 128, 2048, 2048, causal=True)
    cands = AT._candidates(base, 2048, 2048, tri_shape=(1, 8, 2048, 128),
                           hkv=2, causal=True, dtype=jnp.bfloat16)
    assert {c.kernel for c in cands} >= {"worklist", "tri"}
    cands8k = AT._candidates(base, 8192, 8192,
                             tri_shape=(1, 8, 8192, 128), hkv=2,
                             causal=True, dtype=jnp.bfloat16)
    assert {c.kernel for c in cands8k} >= {"worklist", "tri_block"}
    nc = AT._candidates(base, 2048, 2048, tri_shape=(1, 8, 2048, 128),
                        hkv=2, causal=False, dtype=jnp.bfloat16)
    assert {c.kernel for c in nc} == {"worklist"}

    AT._CACHE[((1, 8, 2048, 128), (1, 2, 2048, 128), "bfloat16", True,
               None, "test")] = AT.FlashConfig(kernel="tri", tri_sub=512)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.json")
        AT.save_cache(p)
        AT._CACHE.clear()
        AT.load_cache(p)
    loaded = AT._CACHE[((1, 8, 2048, 128), (1, 2, 2048, 128), "bfloat16",
                        True, None, "test")]
    assert loaded.kernel == "tri" and loaded.tri_sub == 512
    AT._CACHE.clear()
