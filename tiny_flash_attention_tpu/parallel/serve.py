"""Sharded serving decode: tensor-parallel x data-parallel continuous
batching — the multi-chip serving path.

North-star config 4 (BASELINE.json) is multi-host continuous-batching
decode. The decode loop here runs over a (data, model) mesh:

  * MODEL axis (tensor parallel): attention is FULLY LOCAL per chip — kv
    heads shard over the model axis and GQA co-location keeps each group
    of q heads on the chip holding its kv head (the same layout as
    parallel/sharded.py), so the paged-cache gather kernel runs unchanged
    on local head shards and the cache itself shards by kv head (each chip
    holds 1/tp of the pages bytes). The only collectives are the two
    megatron psums per layer (after the attention output projection and
    the MLP down projection), riding ICI.
  * DATA axis: slots and the page pool partition into independent
    contiguous groups (PagedKVCache n_groups) — group g's slots allocate
    only group g's pages, so each data shard holds ONLY its own pool's
    bytes (pages shard over the page dimension) and never gathers another
    group's cache. One host loop drives all groups: batch-dim arrays
    (tokens, positions, page table) shard over `data`, parameters
    replicate across it.
  * Sampling: per-row derived keys (inference.sample_tokens_rowwise) make
    the sampled stream a function of (key chain, global slot id) only, so
    every chip — and the single-chip engine — produces the IDENTICAL
    token stream: the replicated-logits invariant extends to sampled
    decoding, no gather needed.

Works under shard_map on the virtual CPU mesh for tests and on real
ICI/DCN identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.models.inference import (
    _append_rows, sample_tokens_rowwise)
from tiny_flash_attention_tpu.ops.paged_fused import (
    fused_paged_decode_attention)
from tiny_flash_attention_tpu.parallel.train import _local_cfg, param_specs


def make_sharded_decode_loop(cfg: T.ModelConfig, mesh: Mesh, *,
                             page_size: int, fmt: str = "bf16",
                             n_steps: int, greedy: bool = True,
                             model_axis: str = "model",
                             data_axis: str | None = None):
    """Returns decode(params, pages, tokens, positions, page_table, temps,
    key) -> (new_pages, sampled (n_steps, B)).

    params: FULL parameter tree (shard_map splits per param_specs).
    pages: list per layer, (hkv, num_pages, rows, d) — sharded by kv head
    over `model` and (when data_axis is set) by page block over `data`;
    page ids in page_table are GLOBAL (the loop localizes them).
    tokens/positions (B,), page_table (B, pages_per_seq), temps (B,):
    sharded over `data` when set, replicated otherwise. key: replicated.
    """
    tp = mesh.shape[model_axis]
    dp = mesh.shape[data_axis] if data_axis else 1
    cfg_local = _local_cfg(cfg, tp)
    ps = page_size

    def local_loop(params, pages, tokens, positions, page_table, temps,
                   key):
        cap = page_table.shape[1] * ps
        B = tokens.shape[0]          # local batch (global B / dp)
        if data_axis:
            g = jax.lax.axis_index(data_axis)
            p_local = pages[0].shape[1]
            # localize the group's global page ids; clamp keeps freed/idle
            # entries (global 0) on the group's own scratch page instead of
            # wrapping negative into another group's range
            page_table = jnp.clip(page_table - g * p_local, 0, p_local - 1)
            row0 = g * B
        else:
            row0 = 0
        row_ids = row0 + jnp.arange(B)

        def body(carry, _):
            pages, tokens, positions, key = carry
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
            if greedy:
                tokens = jnp.argmax(logits, -1).astype(jnp.int32)
            else:
                # identical key chain + per-(global row) fold as the
                # single-chip decode_loop -> token-exact streams
                key, sub = jax.random.split(key)
                tokens = sample_tokens_rowwise(logits, sub, temps, row_ids)
            return (new_pages, tokens, positions + 1, key), tokens

        (pages, tokens, positions, key), sampled = jax.lax.scan(
            body, (pages, tokens, positions, key), None, length=n_steps)
        if data_axis:
            # the host loop (one per process in multihost serving) needs
            # the FULL stream for EOS/length bookkeeping — replicate the
            # (tiny) token block instead of leaving it data-sharded, so
            # every process can read it without touching remote shards
            sampled = jax.lax.all_gather(sampled, data_axis, axis=1,
                                         tiled=True)
        return pages, sampled

    pspec = jax.tree_util.tree_map(lambda s: s, param_specs(cfg),
                                   is_leaf=lambda x: isinstance(x, P))
    da = data_axis
    page_spec = [P(model_axis, da, None, None)] * cfg.n_layers
    fn = jax.shard_map(
        local_loop, mesh=mesh,
        in_specs=(pspec, page_spec, P(da), P(da), P(da), P(da), P()),
        out_specs=(page_spec, P(None, da) if not da else P()),
        check_vma=False)
    return jax.jit(fn)


class ShardedInferenceEngine:
    """Continuous-batching engine whose decode chunks run on a sharded
    mesh: tensor-parallel over `model_axis`, optionally data-parallel over
    `data_axis` (independent page pools per data group, one host loop).

    Wraps models.engine.InferenceEngine: all host logic (admission, page
    allocation, bucketing, EOS bookkeeping) is inherited; parameters are
    committed to their megatron shardings (replicated over data), cache
    pages shard by kv head over model and by page block over data, and the
    chunked-decode hook dispatches make_sharded_decode_loop. Prefill runs
    through the same jitted path as the single-chip engine — with sharded
    parameters, GSPMD partitions it. Sampled decoding is supported: the
    per-row key derivation keeps every chip's stream identical to the
    single-chip engine's (test_serve_sharded asserts token-exactness)."""

    def __new__(cls, cfg, params, mesh: Mesh, *, model_axis: str = "model",
                data_axis: str | None = None, **kw):
        from jax.sharding import NamedSharding
        from tiny_flash_attention_tpu.models.engine import InferenceEngine

        dp = mesh.shape[data_axis] if data_axis else 1

        class _Sharded(InferenceEngine):
            def _decode_chunk(self, positions, page_table, n):
                key = (n, page_table.shape[1],
                       bool((self.temps == 0.0).all()))
                if key not in self._loops:
                    self._loops[key] = make_sharded_decode_loop(
                        self.cfg, mesh, page_size=self.page_size,
                        fmt=self.kv_format, n_steps=n, greedy=key[2],
                        model_axis=model_axis, data_axis=data_axis)
                self.key, sub = jax.random.split(self.key)
                new_pages, sampled = self._loops[key](
                    self.params, self.cache.pages,
                    jnp.asarray(self.last_token), positions, page_table,
                    jnp.asarray(self.temps), sub)
                self.cache.pages = new_pages
                return sampled

        eng = _Sharded(cfg, params, **kw)
        if dp > 1:
            # re-partition the freshly created cache into dp independent
            # groups: group g owns pages [g*P/dp, (g+1)*P/dp) and reserves
            # its own base page as the idle-slot scratch page
            c = eng.cache
            assert c.pages[0].shape[1] % dp == 0 and c.max_seqs % dp == 0
            c.n_groups = dp
            p_local = c.pages[0].shape[1] // dp
            scratch = {g * p_local for g in range(dp)}
            c.free_pages = [p for p in range(c.pages[0].shape[1] - 1, -1, -1)
                            if p not in scratch]
        eng._loops = {}

        pshard = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), param_specs(cfg),
            is_leaf=lambda x: isinstance(x, P))
        eng.params = jax.device_put(params, pshard)
        page_sh = NamedSharding(mesh, P(model_axis, data_axis, None, None))
        eng.cache.pages = [jax.device_put(p, page_sh)
                           for p in eng.cache.pages]
        return eng
