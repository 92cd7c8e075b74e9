"""Benchmark harness: warmup/epoch timing with a forced host round-trip.

TPU-native equivalent of the reference's `run_benchmark(epoch, warmup, ...)`
with torch.cuda.synchronize inside the timed loop (cutlass/test.py:30-40,
c/test.py:21-31) and cudaEvent loops (cuda standalone :365-390).

On this host the TPU is reached through an async relay where
`block_until_ready` can return before device execution completes, so the only
reliable fence is a device->host transfer: we time `epochs` back-to-back
launches and then read one element of the last result back to the host. The
readback latency is amortized across the epochs (and measured separately as
`overhead_ms` with an empty chain).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def _fence(out):
    """Force completion: pull one element of (the first leaf of) out to host."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in leaf.shape)
    return np.asarray(leaf[idx] if leaf.ndim else leaf)


def run_benchmark(fn: Callable, *args, warmup: int = 5, epochs: int = 100,
                  rounds: int = 3, **kwargs) -> dict:
    """Times fn(*args). Each round launches `epochs` iterations and fences
    once; the fence round-trip (measured separately on an already-complete
    buffer) is subtracted. Reported ms is per-iteration."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    _fence(out)

    # Fence round-trip on completed work (relay RTT), to subtract.
    fences = []
    for _ in range(5):
        t0 = time.perf_counter()
        _fence(out)
        fences.append(time.perf_counter() - t0)
    fence_s = min(fences)

    samples = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(epochs):
            out = fn(*args, **kwargs)
        _fence(out)
        samples.append((time.perf_counter() - t0 - fence_s) / epochs * 1e3)

    return {
        "mean_ms": sum(samples) / len(samples),
        "min_ms": min(samples),
        "fence_ms": fence_s * 1e3,
        "epochs": epochs,
    }


def attention_flops(bs: int, heads: int, q_len: int, kv_len: int, d: int,
                    causal: bool = False) -> int:
    """Forward attention FLOPs: 2 matmuls, 2*q*kv*d each (the reference
    counts the same via FlopCounterMode, main_torch_only.py:292-302)."""
    f = 4 * bs * heads * q_len * kv_len * d
    return f // 2 if causal else f
