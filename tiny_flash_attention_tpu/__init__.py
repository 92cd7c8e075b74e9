"""tiny-flash-attention-tpu: a TPU-native flash-attention framework.

A brand-new JAX/Pallas re-design (not a port) of the capability surface of
66RING/tiny-flash-attention: a ladder of attention implementations from pure-JAX
online-softmax references up to Pallas flash-attention-2 kernels, plus a native
C++/OpenMP CPU oracle, quantized (INT8/FP8) KV caches, paged decode, and
multi-chip sharding (head / sequence parallel, ring attention) via shard_map.

Layer map (mirrors SURVEY.md section 1):
  ops.reference   -- pure-JAX algorithm ladder (ref: flash_attention_py/tiny_flash_attn.py)
  ops.flash       -- Pallas FA2 forward kernel family (ref: tiny_flash_attn_triton.py,
                     flash_attention_cutlass/csrc/flash_attention.cu)
  ops.flash_v1    -- FA1-loop-order Pallas kernel (ref: cuda flash_attention.cu:158-315)
  ops.flash_bwd   -- Pallas backward kernels (fused single-pass + split) via custom_vjp
  ops.flash_quant -- flash attention over INT8/FP8 KV with fused dequant
  ops.paged / ops.paged_fused -- paged KV-cache decode kernels (page-gather DMA)
  ops.quant / ops.quant_matmul -- INT8/FP8 quantization + weight-only matmul
  cpp/            -- native C++/OpenMP/SIMD CPU oracle (ref: flash_attention_c/)
  models          -- flagship GQA transformer + paged cache + continuous batching
  parallel        -- mesh / shard_map / ring-Ulysses / multi-host distributed layer
  utils           -- chained benchmarking, roofline/tracing, test tolerances
"""

__version__ = "0.1.0"

from tiny_flash_attention_tpu.ops.reference import (
    attention_naive,
    attention_safe,
    attention_online,
    flash_attention_v1_ref,
    flash_attention_v2_ref,
    mha_reference,
)
from tiny_flash_attention_tpu.ops.flash import flash_attention, FlashConfig
from tiny_flash_attention_tpu.ops.flash_v1 import flash_attention_v1
