"""Measured config autotuning for the flash-attention forward.

The reference picks num_warps/num_stages from head_dim with a two-entry
table (flash_attention_py/tiny_flash_attn_triton.py:31,44); the static
dispatch tables in ops/configs.py are the equivalent here, hand-tuned on
v5e for d in {64, 128, 256}. This module covers everything the tables
don't: unusual head dims, other chip generations, unusual sequence/batch
mixes — by MEASURING a small candidate set on the actual device and
caching the winner per (shape, dtype, causal, device kind).

    cfg = autotune_flash_config(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, config=cfg)

The candidate set brackets the dispatch default (row budget x2 /2, kv
width x2 /2, kv_splits alternatives), so the cost is a handful of compiles
once per shape class; winners can be persisted with save_cache/load_cache.
"""

from __future__ import annotations

import dataclasses
import functools
import json
from typing import Optional

import jax

from tiny_flash_attention_tpu.ops.configs import (
    FlashConfig, default_config, LANES)

_CACHE: dict = {}


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:  # noqa: BLE001
        return "unknown"


def _candidates(base: FlashConfig, q_len: int, kv_len: int,
                tri_shape=None, hkv=None, causal=True, window=None,
                dtype=None):
    seen, out = set(), []

    def add(bq, bkv, spl):
        bq = max(LANES, min(bq, 16384))
        bkv = max(LANES, min(bkv, _round_up(kv_len, LANES)))
        key = (bq, bkv, spl)
        if key not in seen:
            seen.add(key)
            out.append(dataclasses.replace(
                base, block_q=bq, block_kv=bkv, kv_splits=spl,
                kernel="worklist"))

    b, k, s = base.block_q, base.block_kv, base.kv_splits
    add(b, k, s)
    add(b, k, max(1, s // 2))
    add(b, k, s * 2)
    add(b * 2, k, s)
    add(b // 2, k, s)
    add(b, k * 2, s * 2)
    add(b, max(LANES, k // 2), s)
    # triangle family (causal q==kv only): one-shot when the working set
    # fits, else the q-banded sweep — sweep the chunk width around the
    # measured v5e optimum (sub=256)
    if tri_shape is not None:
        from tiny_flash_attention_tpu.ops import flash_tri
        args = (tri_shape, hkv, kv_len, causal, window, None, None, dtype)
        family = ("tri" if flash_tri.tri_eligible(*args) else
                  "tri_block" if flash_tri.tri_block_eligible(*args) else
                  None)
        if family:
            for sub in (256, 512):
                out.append(dataclasses.replace(
                    base, kernel=family, tri_sub=sub))
    return out


def autotune_flash_config(
    q: jax.Array, k: jax.Array, v: jax.Array, *,
    causal: bool = True,
    window: Optional[int] = None,
    rounds: int = 2,
    candidates=None,
    verbose: bool = False,
) -> FlashConfig:
    """Benchmarks candidate tile configs on the live device; returns the
    fastest. Results are memoized per (shapes, dtype, causal, window,
    device kind) for the process lifetime (see save_cache/load_cache)."""
    from tiny_flash_attention_tpu.ops.flash import flash_attention
    from tiny_flash_attention_tpu.utils.benchmarking import run_benchmark

    bs, hq, q_len, d = q.shape
    kv_len = k.shape[2]
    key = (q.shape, k.shape, str(q.dtype), causal, window, _device_kind())
    if key in _CACHE:
        return _CACHE[key]
    base = default_config(q.dtype, d, q_len, kv_len, causal=causal,
                          interpret=jax.default_backend() != "tpu")
    cands = candidates if candidates is not None else _candidates(
        base, q_len, kv_len, tri_shape=q.shape, hkv=k.shape[1],
        causal=causal, window=window, dtype=q.dtype)
    best, best_ms = base, float("inf")
    for cfg in cands:
        fn = jax.jit(functools.partial(
            flash_attention, causal=causal, window=window, config=cfg))
        try:
            r = run_benchmark(fn, q, k, v, rounds=rounds)
        except Exception as e:  # noqa: BLE001 - infeasible tiling/VMEM
            if verbose:
                print(f"autotune: {cfg.block_q}x{cfg.block_kv}/"
                      f"{cfg.kv_splits} failed: {type(e).__name__}")
            continue
        if verbose:
            print(f"autotune: {cfg.block_q}x{cfg.block_kv}/"
                  f"{cfg.kv_splits}: {r['min_ms']:.3f} ms")
        if r["min_ms"] < best_ms:
            best, best_ms = cfg, r["min_ms"]
    _CACHE[key] = best
    return best


def save_cache(path: str) -> None:
    """Persists tuned winners (JSON) so serving jobs skip re-tuning."""
    rows = []
    for key, cfg in _CACHE.items():
        qs, ks, dtype, causal, window, kind = key
        rows.append({
            "q_shape": list(qs), "k_shape": list(ks), "dtype": dtype,
            "causal": causal, "window": window, "device_kind": kind,
            "config": {"block_q": cfg.block_q, "block_kv": cfg.block_kv,
                       "kv_splits": cfg.kv_splits, "kernel": cfg.kernel,
                       "tri_sub": cfg.tri_sub},
        })
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)


def load_cache(path: str) -> int:
    """Loads winners saved by save_cache; returns the number of entries."""
    with open(path) as f:
        rows = json.load(f)
    for r in rows:
        key = (tuple(r["q_shape"]), tuple(r["k_shape"]), r["dtype"],
               r["causal"], r["window"], r["device_kind"])
        _CACHE[key] = FlashConfig(
            block_q=r["config"]["block_q"],
            block_kv=r["config"]["block_kv"],
            kv_splits=r["config"]["kv_splits"],
            kernel=r["config"].get("kernel", "worklist"),
            tri_sub=r["config"].get("tri_sub", 256),
            interpret=jax.default_backend() != "tpu")
    return len(rows)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
