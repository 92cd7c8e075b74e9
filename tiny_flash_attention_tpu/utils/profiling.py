"""Profiling + roofline accounting.

The reference's observability is wall-clock prints, cudaEvent loops, and
`FlopCounterMode` FLOP dumps (SURVEY.md section 5 tracing row: cutlass/
test.py:30-40, cuda standalone :365-390, main_torch_only.py:292-302). The
TPU-native equivalents here:

  * `trace(logdir)` — context manager around `jax.profiler` emitting an
    xplane trace viewable in TensorBoard/XProf (the -lineinfo/ncu analog).
  * `count_flops(fn, *args)` — FLOPs/bytes of the compiled program from
    XLA's own cost model (the FlopCounterMode analog: counted from the
    program, not hand-derived).
  * `roofline(...)` — classifies a measured kernel run against the chip's
    compute and memory roofs, extended with bytes so it reports which wall
    the kernel is against.

Peak numbers default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM) and can be
overridden per call for other chips.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_PEAK_GBS = 819.0


@contextlib.contextmanager
def trace(logdir: str):
    """Wraps a region in a jax.profiler trace: `with trace('/tmp/tb'): ...`"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def count_flops(fn, *args, **kwargs) -> dict:
    """FLOPs/bytes of `jit(fn)(*args)` per XLA's compiled cost analysis.

    The reference hand-counts attention FLOPs with torch's FlopCounterMode
    (main_torch_only.py:292-302); here the compiler itself is the counter,
    so fusion and rematerialization are reflected. Returns
    {'flops': float, 'bytes_accessed': float} (0.0 when the backend does
    not report a field). Note: Pallas kernels are opaque to XLA's model —
    for those, pass analytic FLOPs to `roofline` instead.
    """
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed",
                                         cost.get("bytes_accessed", 0.0))),
    }


@dataclasses.dataclass(frozen=True)
class RooflineReport:
    achieved_tflops: float
    achieved_gbs: float
    compute_frac: float      # fraction of the compute roof
    memory_frac: float       # fraction of the memory roof
    bound: str               # "compute" | "memory"
    arithmetic_intensity: float   # flops / byte
    ridge_intensity: float        # peak_flops / peak_bytes

    def __str__(self):
        return (f"{self.achieved_tflops:.1f} TFLOP/s "
                f"({100 * self.compute_frac:.0f}% of compute roof), "
                f"{self.achieved_gbs:.0f} GB/s "
                f"({100 * self.memory_frac:.0f}% of memory roof), "
                f"AI={self.arithmetic_intensity:.1f} flop/B "
                f"-> {self.bound}-bound")


def roofline(flops: int, bytes_accessed: int, seconds: float, *,
             peak_tflops: float = V5E_PEAK_TFLOPS_BF16,
             peak_gbs: float = V5E_PEAK_GBS) -> RooflineReport:
    """Places one measured run on the (compute, memory) roofline."""
    tf = flops / seconds / 1e12
    gbs = bytes_accessed / seconds / 1e9
    ai = flops / max(bytes_accessed, 1)
    ridge = peak_tflops * 1e3 / peak_gbs   # flops per byte at the ridge
    return RooflineReport(
        achieved_tflops=tf,
        achieved_gbs=gbs,
        compute_frac=tf / peak_tflops,
        memory_frac=gbs / peak_gbs,
        bound="compute" if ai >= ridge else "memory",
        arithmetic_intensity=ai,
        ridge_intensity=ridge,
    )
