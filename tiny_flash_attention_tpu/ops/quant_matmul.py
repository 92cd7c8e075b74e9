"""Weight-only quantized matmul kernel for small-batch (decode) shapes.

Weight-only INT8/FP8 projections are HBM-bandwidth-bound at decode batch
sizes: the whole win is streaming half the weight bytes. This kernel
streams the int8/fp8 weight through VMEM in (block_k, block_n) tiles,
converts on the VPU next to the MXU feed, and folds the per-output-channel
scale into the f32 epilogue — the TPU analog of the reference archive's
cast-buffer trick (archive attn.cpp:250-351, fp32 staging buffers per
thread), applied to weights instead of KV.

Measured on v5e at B=8, it reaches ~745 GB/s — parity with XLA's fused
convert+dot (732-803 GB/s across decode shapes), so ops/quant.py keeps the
XLA path as the default and this kernel exists for explicit tile control
(and as the template for fusing further work into the stream).

The activation x (B, K) stays resident in VMEM across the whole grid
(it is tiny at decode shapes); the weight is the only streaming operand.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_flash_attention_tpu.ops.quant import QuantizedTensor


def _kernel(x_ref, w_ref, scale_ref, o_ref, acc_scr, *, n_k: int):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[0, :, :]                       # (B_pad, block_k)
    w = w_ref[...].astype(x.dtype)           # (block_k, block_n) VPU convert
    acc_scr[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _done():
        o_ref[0, :, :] = (acc_scr[...] * scale_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "out_dtype", "interpret"))
def quantized_matmul_pallas(
    x: jax.Array,
    qw: QuantizedTensor,
    *,
    block_n: int = 512,
    block_k: int = 2048,
    out_dtype=None,
    interpret: Optional[bool] = None,
):
    """x (B, K) @ dequant(qw (K, N)) -> (B, N); B small (decode batch).

    qw.values: (K, N) int8/fp8, qw.scales: (1, N) f32 per-output-channel.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, K = x.shape
    Kw, N = qw.values.shape
    assert K == Kw, (K, Kw)
    assert qw.scales.shape == (1, N), qw.scales.shape

    block_n = min(block_n, N)
    block_k = min(block_k, K)
    assert N % block_n == 0 and K % block_k == 0, (K, N, block_k, block_n)
    n_n, n_k = N // block_n, K // block_k

    b_pad = max(8, -(-B // 8) * 8)
    xp = jnp.pad(x, ((0, b_pad - B), (0, 0))) if b_pad != B else x
    xp = xp[None]   # leading unit dim so the x BlockSpec can pin index 0

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((1, b_pad, block_k), lambda n, k: (0, 0, k)),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n)),
            pl.BlockSpec((1, block_n), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((1, b_pad, block_n), lambda n, k: (0, 0, n)),
        out_shape=jax.ShapeDtypeStruct((1, b_pad, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((b_pad, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xp, qw.values, qw.scales)
    return out[0, :B]
