"""Sharded training step: data x tensor parallel over a (data, model) mesh.

The reference has no training loop and no distributed layer (SURVEY.md
section 2.6); this is the TPU-native extension, built the production-JAX way:

  * GSPMD (jit + NamedSharding on params/activations) partitions the model
    and inserts the megatron collectives — param shardings below give
    column-sharded wq/wk/wv/w_gate/w_up, row-sharded wo/w_down (psum after),
    replicated embeddings/norms, batch-sharded activations. GSPMD also
    differentiates correctly through all of it (manual-SPMD replicated-param
    gradients are a known foot-gun; measured and rejected here).
  * The one thing GSPMD cannot partition is the Pallas attention kernel, so
    `sharded_attention` wraps exactly that call in a shard_map island with
    heads on 'model' and batch on 'data' (same head-parallel layout as
    parallel/sharded.py; GQA co-location holds, zero collectives inside).

spmd_forward (manual SPMD with explicit psums) is kept for *inference*
forward passes — its gradients would over-count replicated params, so
training goes through the GSPMD path only.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.ops.flash import flash_attention


def param_specs(cfg: T.ModelConfig) -> dict:
    """PartitionSpec tree matching init_params' structure (megatron TP)."""
    layer = {
        "attn_norm": P(None),
        "wq": P(None, "model"),
        "wk": P(None, "model"),
        "wv": P(None, "model"),
        "wo": P("model", None),
        "mlp_norm": P(None),
        "w_gate": P(None, "model"),
        "w_up": P(None, "model"),
        "w_down": P("model", None),
    }
    return {
        "embed": P(None, None),
        # stacked layers: leading layer axis unsharded
        "layers": {k: P(None, *tuple(s)) for k, s in layer.items()},
        "final_norm": P(None),
        "lm_head": P(None, None),
    }


def shard_params(params: dict, mesh: Mesh, cfg: T.ModelConfig) -> dict:
    specs = param_specs(cfg)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, jax.Array))


def sharded_attention(mesh: Mesh):
    """shard_map island: flash attention with batch on 'data', heads on
    'model'; everything else about the kernel is unchanged."""
    spec = P("data", "model", None, None)

    def attn(q, k, v, *, causal=True, window=None):
        return jax.shard_map(
            functools.partial(flash_attention, causal=causal, window=window),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(q, k, v)

    return attn


def make_sharded_model_cfg(cfg: T.ModelConfig, mesh: Mesh) -> T.ModelConfig:
    """Returns a config whose attention runs in the shard_map island."""
    return dataclasses.replace(cfg, attn_impl="flash_sharded")


def make_train_step(cfg: T.ModelConfig, mesh: Mesh,
                    learning_rate: float = 1e-3,
                    optimizer: Optional[optax.GradientTransformation] = None):
    """Returns (train_step, init_state).

    train_step(params, opt_state, tokens) -> (params, opt_state, loss).
    tokens: (global_batch, seq) int32, sharded on 'data'. Params arrive/leave
    with param_specs shardings; GSPMD inserts all collectives.
    """
    if optimizer is None:
        optimizer = optax.adamw(learning_rate)
    attn_island = sharded_attention(mesh)
    run_cfg = (dataclasses.replace(cfg, attn_impl="island")
               if cfg.attn_impl == "flash" else cfg)

    def loss_fn(params, tokens):
        prev = T.ATTN_OVERRIDE.get("island")
        T.ATTN_OVERRIDE["island"] = attn_island
        try:
            return T.loss_fn(run_cfg, params, tokens)
        finally:
            T.ATTN_OVERRIDE["island"] = prev

    def _step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    specs = param_specs(cfg)
    pshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                    is_leaf=lambda x: isinstance(x, P))
    data_shard = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    # opt-state shardings stay unconstrained: optimizer.init is jitted on
    # already-sharded params, so moment buffers inherit the param shardings
    # (optimizer-agnostic — works for adamw, sgd, lion, ...).
    train_step = jax.jit(
        _step,
        in_shardings=(pshard, None, data_shard),
        out_shardings=(pshard, None, repl),
        donate_argnums=(0, 1),
    )

    def init_state(params):
        params = shard_params(params, mesh, cfg)
        opt_state = jax.jit(optimizer.init)(params)
        return params, opt_state

    return train_step, init_state


def save_train_state(path: str, params, opt_state, *, step: int = 0):
    """Checkpoints the sharded train state with orbax (SURVEY.md §5
    checkpoint/resume row, training side; kv_cache.save is the serving
    side). Works for any optimizer whose state is a pytree of arrays.
    `path` is created; the checkpoint lands at `path`/state."""
    import os
    import orbax.checkpoint as ocp
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ck:
        ck.save(os.path.join(os.path.abspath(path), "state"),
                {"params": params, "opt_state": opt_state,
                 "step": jnp.asarray(step, jnp.int32)})


def restore_train_state(path: str, params_like, opt_state_like,
                        mesh: Mesh, cfg):
    """Restores a checkpoint saved by save_train_state and re-places
    params on their param_specs shardings; opt-state arrives replicated
    and the first jitted train_step re-shards it (its opt-state sharding
    is unconstrained — the same invariant init_state establishes).
    `*_like` trees provide structure/shapes/dtypes (e.g. from a fresh
    init_state). Returns (params, opt_state, step)."""
    import os
    import orbax.checkpoint as ocp

    def abstract(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)

    target = {"params": abstract(params_like),
              "opt_state": abstract(opt_state_like),
              "step": jax.ShapeDtypeStruct((), jnp.int32)}
    with ocp.StandardCheckpointer() as ck:
        state = ck.restore(os.path.join(os.path.abspath(path), "state"),
                           target)
    return (shard_params(state["params"], mesh, cfg), state["opt_state"],
            int(state["step"]))


# --- manual-SPMD inference forward (kept for the serving path) ---------------


def _local_cfg(cfg: T.ModelConfig, tp: int) -> T.ModelConfig:
    assert cfg.n_q_heads % tp == 0 and cfg.n_kv_heads % tp == 0, (
        f"heads ({cfg.n_q_heads}q/{cfg.n_kv_heads}kv) not divisible by "
        f"tp={tp}")
    return dataclasses.replace(
        cfg, n_q_heads=cfg.n_q_heads // tp, n_kv_heads=cfg.n_kv_heads // tp)


def spmd_forward(cfg_local: T.ModelConfig, params: dict, tokens: jax.Array,
                 model_axis: str = "model") -> jax.Array:
    """Per-device INFERENCE forward on local head shards (runs inside
    shard_map): local partial projections + megatron psums. Do not take
    gradients through this — replicated-param cotangents over-count; use
    make_train_step's GSPMD path for training."""
    b, s = tokens.shape
    positions = jnp.arange(s, dtype=jnp.int32)
    x = params["embed"][tokens].astype(cfg_local.dtype)

    def body(x, layer):
        q, k, v = T.qkv_proj(cfg_local, layer, x, positions)
        o = T._attention(cfg_local, q, k, v, causal=True)
        o = o.transpose(0, 2, 1, 3).reshape(
            b, s, cfg_local.n_q_heads * cfg_local.d_head)
        x = x + jax.lax.psum(T._proj(o, layer["wo"]).astype(jnp.float32),
                             model_axis).astype(cfg_local.dtype)
        xn = T.rms_norm(x, layer["mlp_norm"], cfg_local.rms_eps)
        gate = jax.nn.silu(T._proj(xn, layer["w_gate"]).astype(jnp.float32))
        up = T._proj(xn, layer["w_up"]).astype(jnp.float32)
        down = T._proj((gate * up).astype(x.dtype), layer["w_down"])
        x = x + jax.lax.psum(down.astype(jnp.float32),
                             model_axis).astype(cfg_local.dtype)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = T.rms_norm(x, params["final_norm"], cfg_local.rms_eps)
    return T._proj(x, params["lm_head"]).astype(jnp.float32)
