"""Sharded training step vs single-device: loss + param-update parity on the
8-device virtual CPU mesh (dp=4 x tp=2)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.parallel.sharded import make_mesh
from tiny_flash_attention_tpu.parallel.train import (
    make_train_step, spmd_forward, shard_params, _local_cfg)
from tiny_flash_attention_tpu.utils import assert_close

CFG = T.ModelConfig(
    vocab_size=128, d_model=128, n_layers=2, n_q_heads=4, n_kv_heads=2,
    d_head=128, d_ff=256, dtype=jnp.float32, attn_impl="reference")


def test_spmd_forward_matches_single_device():
    mesh = make_mesh(8, data=4, model=2)
    params = T.init_params(CFG, jax.random.key(0))
    toks = jax.random.randint(jax.random.key(1), (8, 64), 0, 128)
    want = T.forward(CFG, params, toks)

    sharded = shard_params(params, mesh, CFG)
    from jax.sharding import PartitionSpec as P
    from tiny_flash_attention_tpu.parallel.train import param_specs
    fwd = jax.jit(jax.shard_map(
        lambda p, t: spmd_forward(_local_cfg(CFG, 2), p, t),
        mesh=mesh, in_specs=(param_specs(CFG), P("data", None)),
        out_specs=P("data", None), check_vma=False))
    got = fwd(sharded, toks)
    assert_close(got, want, atol=1e-3, name="spmd logits")


def test_train_step_matches_single_device():
    mesh = make_mesh(8, data=4, model=2)
    params = T.init_params(CFG, jax.random.key(0))
    toks = jax.random.randint(jax.random.key(2), (8, 64), 0, 128)

    # single-device oracle step. SGD: updates are linear in the gradients,
    # so parity is a direct gradient-parity check (adam's g/sqrt(g2) at step
    # one amplifies reduction-order noise unboundedly near g=0).
    opt = optax.sgd(1e-2)
    opt_state0 = opt.init(params)

    def loss_fn(p):
        return T.loss_fn(CFG, p, toks)

    loss_want, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt_state0, params)
    params_want = optax.apply_updates(params, updates)

    # sharded step
    train_step, init_state = make_train_step(CFG, mesh,
                                             optimizer=optax.sgd(1e-2))
    sparams, sopt = init_state(params)
    new_params, _, loss_got = train_step(sparams, sopt, toks)

    assert_close(jnp.asarray(loss_got), loss_want, atol=1e-5, name="loss")
    # spot-check a few param leaves (replicated + column + row sharded)
    for path in (("embed",), ("layers", "wq"), ("layers", "wo"),
                 ("layers", "w_down"), ("final_norm",)):
        a, b = new_params, params_want
        for k in path:
            a, b = a[k], b[k]
        assert_close(np.asarray(a), np.asarray(b), atol=2e-5,
                     name="/".join(path))


def test_train_step_runs_multiple_iterations():
    mesh = make_mesh(8, data=4, model=2)
    params = T.init_params(CFG, jax.random.key(3))
    train_step, init_state = make_train_step(CFG, mesh)
    state = init_state(params)
    sparams, sopt = state
    losses = []
    for i in range(3):
        toks = jax.random.randint(jax.random.key(10 + i), (8, 64), 0, 128)
        sparams, sopt, loss = train_step(sparams, sopt, toks)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0]  # memorizing random batches still descends


def test_train_state_checkpoint_roundtrip(tmp_path):
    """save/restore_train_state (orbax): resuming from the checkpoint
    produces the identical next-step loss as the uninterrupted run, and
    restored params land on their param_specs shardings."""
    from tiny_flash_attention_tpu.parallel.train import (
        save_train_state, restore_train_state, param_specs)

    mesh = make_mesh(8, data=4, model=2)
    params = T.init_params(CFG, jax.random.key(5))
    train_step, init_state = make_train_step(CFG, mesh)
    sparams, sopt = init_state(params)
    toks = [jax.random.randint(jax.random.key(30 + i), (8, 64), 0, 128)
            for i in range(3)]
    sparams, sopt, _ = train_step(sparams, sopt, toks[0])
    sparams, sopt, _ = train_step(sparams, sopt, toks[1])
    save_train_state(str(tmp_path / "ck"), sparams, sopt, step=2)
    _, _, loss_cont = train_step(sparams, sopt, toks[2])

    f_params, f_opt = init_state(T.init_params(CFG, jax.random.key(99)))
    r_params, r_opt, step = restore_train_state(
        str(tmp_path / "ck"), f_params, f_opt, mesh, CFG)
    assert step == 2
    emb = r_params["embed"]
    assert emb.sharding.spec == param_specs(CFG)["embed"]
    _, _, loss_resume = train_step(r_params, r_opt, toks[2])
    np.testing.assert_allclose(float(loss_resume), float(loss_cont),
                               rtol=0, atol=0)


def test_hybrid_mesh_single_slice_and_sharded_step():
    """make_hybrid_mesh degrades to (1, ici...) on one slice; a shard_map
    collective over its axes runs on the virtual devices."""
    from tiny_flash_attention_tpu.parallel.multihost import (
        initialize_multihost, make_hybrid_mesh)

    initialize_multihost()   # no coordinator configured -> no-op
    mesh = make_hybrid_mesh(ici_axes=("model", "seq"), ici_shape=(4, 2))
    assert dict(mesh.shape) == {"data": 1, "model": 4, "seq": 2}

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P("model"), out_specs=P())
    def total(x):
        return jax.lax.psum(jnp.sum(x), ("model",))

    x = jnp.arange(8.0)
    assert float(total(x)) == float(jnp.sum(x))


def test_hybrid_mesh_multi_slice_device_array():
    """The multi-slice branch must produce [num_slices, *ici_shape] so it
    matches the (dcn_axis, *ici_axes) names (regression: the ici/dcn shapes
    were passed un-aligned and the result dropped the DCN axis)."""
    from tiny_flash_attention_tpu.parallel.multihost import (
        _hybrid_device_array)

    class FakeDev:
        platform = "cpu"
        device_kind = "fake"

        def __init__(self, i, slice_index):
            self.id = i
            self.process_index = slice_index
            self.slice_index = slice_index

        def __repr__(self):
            return f"fake({self.id})"

    devices = [FakeDev(i, slice_index=i // 4) for i in range(8)]
    arr = _hybrid_device_array(devices, ici_shape=[2, 2], num_slices=2)
    assert arr.shape == (2, 2, 2), arr.shape
    # every ICI block holds exactly one slice's devices
    for s in range(2):
        assert {d.slice_index for d in arr[s].flat} == {s}
    # single-slice fallback keeps the leading DCN axis of size 1
    arr1 = _hybrid_device_array(devices, ici_shape=[8], num_slices=1)
    assert arr1.shape == (1, 8)
