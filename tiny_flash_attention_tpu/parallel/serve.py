"""Tensor-parallel serving decode: the multi-chip continuous-batching path.

North-star config 4 (BASELINE.json) is multi-host continuous-batching
decode. The building block here is a megatron-sharded decode loop over the
mesh's model axis:

  * attention is FULLY LOCAL per chip — kv heads shard over the model axis
    and GQA co-location keeps each group of q heads on the chip holding its
    kv head (the same layout as parallel/sharded.py), so the paged-cache
    gather kernel runs unchanged on local head shards and the cache itself
    shards by kv head (each chip holds 1/tp of the pages bytes);
  * the only collectives are the two megatron psums per layer (after the
    attention output projection and the MLP down projection), riding ICI;
  * embeddings/lm_head stay replicated, so the psum'd activations produce
    identical logits (and identical sampled tokens) on every chip — the
    sampled stream is replicated output, no gather needed.

Data parallelism over serving is embarrassingly parallel (independent
engines per data group); this module covers the axis that actually needs
collectives. Works under shard_map on the virtual CPU mesh for tests and
on real ICI identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.models.inference import _append_rows
from tiny_flash_attention_tpu.ops.paged_fused import (
    fused_paged_decode_attention)
from tiny_flash_attention_tpu.parallel.train import _local_cfg, param_specs


def make_sharded_decode_loop(cfg: T.ModelConfig, mesh: Mesh, *,
                             page_size: int, fmt: str = "bf16",
                             n_steps: int, greedy: bool = True,
                             model_axis: str = "model"):
    """Returns decode(params, pages, tokens, positions, page_table) ->
    (new_pages, sampled (n_steps, B)).

    params: FULL parameter tree (shard_map splits per param_specs).
    pages: list per layer, (hkv, num_pages, rows, d) — sharded by kv head.
    tokens/positions (B,), page_table (B, pages_per_seq): replicated.
    """
    tp = mesh.shape[model_axis]
    cfg_local = _local_cfg(cfg, tp)
    ps = page_size
    assert greedy, "sampled decoding: pass temps/key through a custom body"

    def local_loop(params, pages, tokens, positions, page_table):
        cap = page_table.shape[1] * ps

        def body(carry, _):
            pages, tokens, positions = carry
            B = tokens.shape[0]
            x = params["embed"][tokens][:, None, :].astype(cfg.dtype)
            lengths = positions + 1
            if cfg.attn_window is None:
                lengths = jnp.minimum(lengths, cap)
            page_ids = jnp.take_along_axis(
                page_table,
                ((positions // ps) % page_table.shape[1])[:, None],
                axis=1)[:, 0]
            rows = positions % ps

            new_pages = []
            for li in range(len(pages)):
                layer = jax.tree_util.tree_map(lambda a: a[li],
                                               params["layers"])
                q, k, v = T.qkv_proj(cfg_local, layer, x, positions[:, None])
                lp = _append_rows(pages[li], k[:, :, 0], v[:, :, 0],
                                  page_ids, rows, page_size=ps, fmt=fmt)
                new_pages.append(lp)
                o, _ = fused_paged_decode_attention(
                    q[:, :, 0], lp, lengths, page_table, page_size=ps,
                    window=cfg.attn_window)
                o = o.reshape(B, 1,
                              cfg_local.n_q_heads * cfg_local.d_head
                              ).astype(cfg.dtype)
                # megatron psum #1: attention output projection
                x = x + jax.lax.psum(
                    T._proj(o, layer["wo"]).astype(jnp.float32),
                    model_axis).astype(cfg.dtype)
                # megatron psum #2: MLP down projection
                xn = T.rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
                gate = jax.nn.silu(
                    T._proj(xn, layer["w_gate"]).astype(jnp.float32))
                up = T._proj(xn, layer["w_up"]).astype(jnp.float32)
                down = T._proj((gate * up).astype(x.dtype),
                               layer["w_down"])
                x = x + jax.lax.psum(down.astype(jnp.float32),
                                     model_axis).astype(cfg.dtype)

            x = T.rms_norm(x, params["final_norm"], cfg.rms_eps)
            logits = T._proj(x[:, 0], params["lm_head"])
            tokens = jnp.argmax(logits, -1).astype(jnp.int32)
            return (new_pages, tokens, positions + 1), tokens

        (pages, tokens, positions), sampled = jax.lax.scan(
            body, (pages, tokens, positions), None, length=n_steps)
        return pages, sampled

    pspec = jax.tree_util.tree_map(lambda s: s, param_specs(cfg),
                                   is_leaf=lambda x: isinstance(x, P))
    page_spec = [P(model_axis, None, None, None)] * cfg.n_layers
    fn = jax.shard_map(
        local_loop, mesh=mesh,
        in_specs=(pspec, page_spec, P(), P(), P()),
        out_specs=(page_spec, P()),
        check_vma=False)
    return jax.jit(fn)


class ShardedInferenceEngine:
    """Continuous-batching engine whose decode chunks run tensor-parallel.

    Wraps models.engine.InferenceEngine: all host logic (admission, page
    allocation, bucketing, EOS bookkeeping) is inherited; parameters are
    committed to their megatron shardings, cache pages shard by kv head
    over the model axis, and the chunked-decode hook dispatches
    make_sharded_decode_loop. Prefill runs through the same jitted path as
    the single-chip engine — with sharded parameters, GSPMD partitions it.
    Greedy decoding only (the sharded loop's replicated-stream invariant).
    """

    def __new__(cls, cfg, params, mesh: Mesh, *, model_axis: str = "model",
                **kw):
        from jax.sharding import NamedSharding
        from tiny_flash_attention_tpu.models.engine import InferenceEngine

        class _Sharded(InferenceEngine):
            def _decode_chunk(self, positions, page_table, n):
                assert (self.temps == 0.0).all(), \
                    "sharded engine serves greedy streams"
                key = (n, page_table.shape[1])
                if key not in self._loops:
                    self._loops[key] = make_sharded_decode_loop(
                        self.cfg, mesh, page_size=self.page_size,
                        fmt=self.kv_format, n_steps=n,
                        model_axis=model_axis)
                new_pages, sampled = self._loops[key](
                    self.params, self.cache.pages,
                    jnp.asarray(self.last_token), positions, page_table)
                self.cache.pages = new_pages
                return sampled

        eng = _Sharded(cfg, params, **kw)
        pshard = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), param_specs(cfg),
            is_leaf=lambda x: isinstance(x, P))
        eng.params = jax.device_put(params, pshard)
        page_sh = NamedSharding(mesh, P(model_axis, None, None, None))
        eng.cache.pages = [jax.device_put(p, page_sh)
                           for p in eng.cache.pages]
        eng._loops = {}
        return eng
