"""Triangle-decomposition kernel (ops/flash_tri.py) parity suite.

Oracle ladder per the reference's test pattern (SURVEY.md section 4): fp32
pure-JAX naive reference -> work-list kernel -> tri kernel, with
dtype-tiered tolerances (fp32 ~1e-5-class, bf16-class 1e-2 — ref
flash_attention_cutlass/test.py:87)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.ops.flash import _flash_fwd_impl, flash_attention
from tiny_flash_attention_tpu.ops.flash_tri import (
    tri_flash_fwd, tri_eligible, tri_block_fwd, tri_block_eligible)
from tiny_flash_attention_tpu.ops.quant import quantize_kv
from tiny_flash_attention_tpu.ops.reference import mha_reference


def _mk(shape_q, shape_kv, dtype, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    return (jax.random.normal(k1, shape_q, dtype),
            jax.random.normal(k2, shape_kv, dtype),
            jax.random.normal(k3, shape_kv, dtype))


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 1e-5),
                                        (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("s,sub,leaf,group", [(256, 128, None, 4),
                                              (384, 256, None, 1),
                                              (512, 128, None, 2),
                                              (512, 256, 128, 2),
                                              (640, 512, 128, 1)])
def test_tri_matches_reference(dtype, atol, s, sub, leaf, group):
    q, k, v = _mk((2, 2 * group, s, 64), (2, 2, s, 64), dtype)
    out, lse = tri_flash_fwd(q, k, v, sm_scale=0.125, sub=sub, leaf=leaf,
                             interpret=True)
    want = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), causal=True, sm_scale=0.125)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want), atol=atol, rtol=0)


def test_tri_mqa_wide_group():
    """MQA (n_kv_heads=1): the whole head dim folds into ONE grid step's
    rows (group == hq) — the widest fold the kernel supports (ref GQA
    grouping seed: flash_attention_c archive attn.cpp:29-375, taken to
    its kv_heads=1 extreme)."""
    q, k, v = _mk((1, 8, 384, 64), (1, 1, 384, 64), jnp.bfloat16, seed=11)
    out, _ = tri_flash_fwd(q, k, v, sm_scale=0.125, sub=128,
                           interpret=True)
    want = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), causal=True, sm_scale=0.125)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want), atol=2e-2, rtol=0)


def test_tri_lse_bitexact_vs_worklist():
    """Same log2-domain math as the work-list kernel -> identical LSE."""
    q, k, v = _mk((2, 4, 256, 64), (2, 1, 256, 64), jnp.float32, seed=3)
    out_t, lse_t = tri_flash_fwd(q, k, v, sm_scale=0.1, sub=128,
                                 interpret=True)
    out_w, lse_w = _flash_fwd_impl(
        q, k, v, None, True, 0.1,
        FlashConfig(block_q=128, block_kv=128, interpret=True))
    np.testing.assert_array_equal(np.asarray(lse_t), np.asarray(lse_w))
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_w),
                               atol=1e-6, rtol=0)


@pytest.mark.parametrize("fmt,atol", [("int8", 2e-2), ("fp8", 2e-2)])
def test_tri_quantized_vs_dequant_oracle(fmt, atol):
    q, k, v = _mk((1, 4, 256, 128), (1, 1, 256, 128), jnp.bfloat16, seed=5)
    qk, qv = quantize_kv(k, v, fmt)
    out, _ = tri_flash_fwd(q, qk.values, qv.values, sm_scale=0.1, sub=128,
                           k_scales=qk.scales, v_scales=qv.scales,
                           interpret=True)
    want = mha_reference(q.astype(jnp.float32), qk.dequantize(),
                         qv.dequantize(), causal=True, sm_scale=0.1)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want), atol=atol, rtol=0)


def test_auto_dispatch_routes_and_matches():
    """flash_attention's default dispatch routes plain causal prefill to
    the tri kernel (s >= 1024) and stays correct + differentiable."""
    assert tri_eligible((2, 8, 2048, 128), 2, 2048, True, None, None, None,
                        jnp.bfloat16)
    assert not tri_eligible((2, 8, 2048, 128), 2, 2048, False, None, None,
                            None, jnp.bfloat16)
    assert not tri_eligible((2, 8, 2048, 128), 2, 1024, True, None, None,
                            None, jnp.bfloat16)
    q, k, v = _mk((1, 4, 1024, 64), (1, 2, 1024, 64), jnp.bfloat16, seed=7)
    got = flash_attention(q, k, v, causal=True)
    want = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), causal=True)
    assert float(np.max(np.abs(np.asarray(got, np.float32)
                               - np.asarray(want)))) < 2e-2

    def loss(q, k, v):
        return flash_attention(q, k, v, causal=True).astype(
            jnp.float32).sum()

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert dq.shape == q.shape and dk.shape == k.shape


def test_forced_tri_config():
    """kernel='tri' in an explicit config forces the tri path at any
    (eligible-semantics) size."""
    q, k, v = _mk((1, 2, 256, 64), (1, 2, 256, 64), jnp.float32, seed=9)
    cfg = FlashConfig(kernel="tri", tri_sub=128, interpret=True)
    got = flash_attention(q, k, v, causal=True, config=cfg)
    want = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=0)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 1e-5),
                                        (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("s,group", [(2048, 4), (2500, 4), (1536, 1)])
def test_tri_block_matches_reference(dtype, atol, s, group):
    """Q-banded sweep (grid over row bands + dynamic rect fori_loop)
    matches the fp32 oracle, incl. a non-128-multiple length."""
    q, k, v = _mk((1, 2 * group, s, 64), (1, 2, s, 64), dtype)
    out, lse = tri_block_fwd(q, k, v, sm_scale=0.125, sub=256, leaf=128,
                             interpret=True)
    want, wlse = mha_reference(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), causal=True, sm_scale=0.125,
        return_lse=True,
        impl=__import__("tiny_flash_attention_tpu.ops.reference",
                        fromlist=["flash_attention_v2_ref"]
                        ).flash_attention_v2_ref)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want), atol=atol, rtol=0)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(wlse),
                               atol=max(atol, 2e-6), rtol=1e-2)


def test_tri_block_quantized_vs_dequant_oracle():
    q, k, v = _mk((1, 4, 2048, 128), (1, 1, 2048, 128), jnp.bfloat16,
                  seed=5)
    qk, qv = quantize_kv(k, v, "int8")
    out, _ = tri_block_fwd(q, qk.values, qv.values, sm_scale=0.1, sub=256,
                           k_scales=qk.scales, v_scales=qv.scales,
                           interpret=True)
    want = mha_reference(q.astype(jnp.float32), qk.dequantize(),
                         qv.dequantize(), causal=True, sm_scale=0.1)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want), atol=2e-2, rtol=0)


def test_tri_block_auto_dispatch_gate():
    """auto routes to the banded kernel exactly when the one-shot working
    set exceeds VMEM but the banded one fits (s8k GQA-4 d128 bf16)."""
    from tiny_flash_attention_tpu.ops.flash_tri import _vmem_estimate
    shape = (1, 8, 8192, 128)
    assert _vmem_estimate(shape, 2, jnp.bfloat16) > \
        __import__("tiny_flash_attention_tpu.ops.flash_tri",
                   fromlist=["_VMEM_BUDGET"])._VMEM_BUDGET
    assert tri_block_eligible(shape, 2, 8192, True, None, None, None,
                              jnp.bfloat16)
    assert not tri_block_eligible(shape, 2, 8192, False, None, None, None,
                                  jnp.bfloat16)
    assert not tri_block_eligible(shape, 2, 4096, True, None, None, None,
                                  jnp.bfloat16)


def test_tri_block_window_matches_worklist():
    """Sliding-window causal through the banded sweep (band clipped to
    <= window, left-edge chunks masked) vs the work-list kernel."""
    q, k, v = _mk((1, 8, 2048, 64), (1, 2, 2048, 64), jnp.bfloat16,
                  seed=17)
    want = flash_attention(
        q, k, v, causal=True, window=512,
        config=FlashConfig(block_q=1024, block_kv=256, interpret=True))
    got = flash_attention(
        q, k, v, causal=True, window=512,
        config=FlashConfig(kernel="tri_block", tri_sub=256, tri_leaf=128,
                           interpret=True))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2,
                               rtol=0)
    # auto routes windowed causal prefill to the banded kernel too
    assert tri_block_eligible((1, 8, 2048, 64), 2, 2048, True, 512, None,
                              None, jnp.bfloat16)
    auto = flash_attention(q, k, v, causal=True, window=512)
    np.testing.assert_allclose(np.asarray(auto, np.float32),
                               np.asarray(want, np.float32), atol=2e-2,
                               rtol=0)


def test_forced_tri_block_config():
    """kernel='tri_block' forces the banded path and stays correct +
    differentiable through flash_attention's custom vjp."""
    q, k, v = _mk((1, 4, 1024, 64), (1, 2, 1024, 64), jnp.bfloat16,
                  seed=11)
    cfg = FlashConfig(kernel="tri_block", tri_sub=256, tri_leaf=128,
                      interpret=True)
    got = flash_attention(q, k, v, causal=True, config=cfg)
    want = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), causal=True)
    assert float(np.max(np.abs(np.asarray(got, np.float32)
                               - np.asarray(want)))) < 2e-2

    def loss(q, k, v):
        return flash_attention(q, k, v, causal=True,
                               config=cfg).astype(jnp.float32).sum()

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert dq.shape == q.shape and dk.shape == k.shape


def test_tri_backward_matches_autodiff_oracle():
    """One-shot tri backward (dq+dk+dv in one kernel) vs autodiff through
    the fp32 reference, fwd and bwd both at sub=256/leaf=128."""
    from tiny_flash_attention_tpu.ops.flash_tri_bwd import tri_flash_bwd

    q, k, v = _mk((2, 4, 384, 64), (2, 2, 384, 64), jnp.float32, seed=13)
    do = jax.random.normal(jax.random.key(14), q.shape, q.dtype)
    sc = 0.125
    out, lse = tri_flash_fwd(q, k, v, sm_scale=sc, sub=256, leaf=128,
                             interpret=True)
    dq, dk, dv = tri_flash_bwd(q, k, v, out, lse, do, sm_scale=sc,
                               sub=256, leaf=128, interpret=True)

    def loss(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True, sm_scale=sc)
                       * do)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), atol=1e-5,
                               rtol=0)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), atol=1e-5,
                               rtol=0)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), atol=1e-5,
                               rtol=0)


def test_tri_backward_via_custom_vjp_dispatch():
    """grad through flash_attention with kernel='tri' runs the tri
    backward and matches the reference's grads (bf16 gate)."""
    q, k, v = _mk((1, 4, 256, 64), (1, 1, 256, 64), jnp.bfloat16, seed=15)
    cfg = FlashConfig(kernel="tri", tri_sub=128, interpret=True)

    def loss(fn, *args):
        return fn(*args).astype(jnp.float32).sum()

    got = jax.grad(
        lambda q, k, v: loss(
            lambda *a: flash_attention(*a, causal=True, config=cfg),
            q, k, v), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(
        lambda q, k, v: loss(
            lambda q, k, v: mha_reference(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), causal=True),
            q, k, v), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # bf16-class gate relative to each grad's magnitude (grads scale
        # with the sum-loss fan-in; cf. hw_check's relative grad gates)
        np.testing.assert_allclose(a, b, atol=2e-2 * np.abs(b).max(),
                                   rtol=0)


def test_tri_banded_backward_matches_autodiff_oracle():
    """Row-banded triangle backward (multi-band grid, dk/dv accumulated
    across sequential band steps) vs autodiff through the fp32 ref."""
    from tiny_flash_attention_tpu.ops.flash_tri_bwd import (
        tri_flash_bwd_banded)

    q, k, v = _mk((1, 4, 768, 64), (1, 2, 768, 64), jnp.float32, seed=23)
    do = jax.random.normal(jax.random.key(24), q.shape, q.dtype)
    sc = 0.125
    out, lse = tri_flash_fwd(q, k, v, sm_scale=sc, sub=256, leaf=128,
                             interpret=True)
    dq, dk, dv = tri_flash_bwd_banded(q, k, v, out, lse, do, sm_scale=sc,
                                      sub=256, leaf=128, band_rows=256,
                                      interpret=True)

    def loss(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True, sm_scale=sc)
                       * do)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), atol=1e-5,
                               rtol=0)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), atol=1e-5,
                               rtol=0)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), atol=1e-5,
                               rtol=0)


def test_tri_backward_head_splits():
    """Forced head_splits > 1: dk/dv accumulate across the sequential
    split steps and still match the unsplit result (up to the summation
    reassociation splitting introduces: the unsplit kernel contracts the
    whole group inside one dot, splits add per-step partials in fp32)."""
    from tiny_flash_attention_tpu.ops.flash_tri_bwd import tri_flash_bwd

    q, k, v = _mk((1, 4, 256, 64), (1, 1, 256, 64), jnp.float32, seed=21)
    do = jax.random.normal(jax.random.key(22), q.shape, q.dtype)
    out, lse = tri_flash_fwd(q, k, v, sm_scale=0.125, sub=128,
                             interpret=True)
    ref = tri_flash_bwd(q, k, v, out, lse, do, sm_scale=0.125, sub=128,
                        head_splits=1, interpret=True)
    for hs in (2, 4):
        got = tri_flash_bwd(q, k, v, out, lse, do, sm_scale=0.125,
                            sub=128, head_splits=hs, interpret=True)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
