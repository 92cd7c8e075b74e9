"""Context-parallel attention vs single-device flash on the 8-device mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.parallel.ring import (
    make_ring_attention, make_ulysses_attention, make_allgather_attention)
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
