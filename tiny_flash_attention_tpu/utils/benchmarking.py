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


def _auto_chain(out, args):
    """Feed the first output leaf back as the first argument (data-dependent
    chaining defeats CSE/hoisting inside the scan)."""
    return (jax.tree_util.tree_leaves(out)[0],) + tuple(args[1:])


def _make_stepper(fn, epochs, chain, kwargs):
    """One jittable device-side loop of `epochs` chained fn calls."""
    def body(carry, _):
        out = fn(*carry, **kwargs)
        return chain(out, carry), None

    return jax.jit(
        lambda a: jax.lax.scan(body, a, None, length=epochs)[0])


def run_benchmark(fn: Callable, *args, warmup: int = 5, epochs: int = 100,
                  rounds: int = 3, chain="auto", **kwargs) -> dict:
    """Times fn(*args). Each round launches `epochs` iterations and fences
    once; the fence round-trip (measured separately on an already-complete
    buffer) is subtracted. Reported ms is per-iteration.

    When the iterations can be chained (the first output leaf matches the
    first argument's shape/dtype, or an explicit `chain(out, args) -> args`
    is given), the whole round runs device-side inside one `lax.scan` — a
    single dispatch — because on the async relay the per-call dispatch
    latency is both large and noisy enough to dominate sub-ms kernels.
    Pass chain=None to force the per-call dispatch loop.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    _fence(out)

    if chain == "auto":
        leaf = jax.tree_util.tree_leaves(out)[0]
        chain = None
        # args may be pytrees (e.g. QuantizedTensor) — only the chained
        # first argument must be a raw array. Requiring every arg to be
        # one silently demoted quantized-attention rows to the per-call
        # dispatch loop, which measures launch overhead, not the kernel
        # (int8 prefill read 111 TF/s unchained vs 128.6 chained).
        if (args and isinstance(args[0], jax.Array)
                and all(isinstance(a, jax.Array)
                        for a in jax.tree_util.tree_leaves(args))
                and leaf.shape == args[0].shape
                and leaf.dtype == args[0].dtype):
            chain = _auto_chain
    if chain is not None:
        stepper = _make_stepper(fn, epochs, chain, kwargs)
        carry = stepper(tuple(args))  # compile + warm
        _fence(carry)
        fences = []
        for _ in range(5):
            t0 = time.perf_counter()
            _fence(carry)
            fences.append(time.perf_counter() - t0)
        fence_s = min(fences)

        # Calibrate: the fence round-trip (~25 ms on the relay) has ms-level
        # jitter, so each timed round must be long enough to swamp it.
        t0 = time.perf_counter()
        carry = stepper(tuple(args))
        _fence(carry)
        est_s = max((time.perf_counter() - t0 - fence_s) / epochs, 1e-7)
        target_round_s = 0.4
        cal_epochs = min(max(epochs, int(target_round_s / est_s)), 20000)
        if cal_epochs != epochs:
            epochs = cal_epochs
            stepper = _make_stepper(fn, epochs, chain, kwargs)
            carry = stepper(tuple(args))
            _fence(carry)

        raws = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            carry = stepper(tuple(args))
            _fence(carry)
            raws.append(time.perf_counter() - t0)
        # The relay RTT jitters at the ms level; if the calibration fences
        # happened to catch a slow period, subtracting them can exceed a
        # fast round's total and yield a NEGATIVE time (observed once as a
        # -1917 TF/s row). Clamp the fence to 90% of the fastest round —
        # conservative: throughput is under-, never over-reported.
        fence_s = min(fence_s, 0.9 * min(raws))
        samples = sorted((r - fence_s) / epochs * 1e3 for r in raws)
        return {
            "mean_ms": sum(samples) / len(samples),
            "min_ms": samples[0],
            "median_ms": samples[len(samples) // 2],
            "spread": (samples[-1] - samples[0]) / samples[len(samples) // 2],
            "fence_ms": fence_s * 1e3,
            "epochs": epochs,
            "chained": True,
        }

    # Fence round-trip on completed work (relay RTT), to subtract.
    fences = []
    for _ in range(5):
        t0 = time.perf_counter()
        _fence(out)
        fences.append(time.perf_counter() - t0)
    fence_s = min(fences)

    raws = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(epochs):
            out = fn(*args, **kwargs)
        _fence(out)
        raws.append(time.perf_counter() - t0)

    fence_s = min(fence_s, 0.9 * min(raws))   # see the chained-path note
    samples = sorted((r - fence_s) / epochs * 1e3 for r in raws)
    return {
        "mean_ms": sum(samples) / len(samples),
        "min_ms": samples[0],
        "median_ms": samples[len(samples) // 2],
        "spread": (samples[-1] - samples[0]) / samples[len(samples) // 2],
        "fence_ms": fence_s * 1e3,
        "epochs": epochs,
    }


def attention_flops(bs: int, heads: int, q_len: int, kv_len: int, d: int,
                    causal: bool = False) -> int:
    """Forward attention FLOPs: 2 matmuls, 2*q*kv*d each (the reference
    counts the same via FlopCounterMode, main_torch_only.py:292-302)."""
    f = 4 * bs * heads * q_len * kv_len * d
    return f // 2 if causal else f
