"""Kernel configuration + dispatch table.

The idiomatic TPU equivalent of the reference's compile-time template dispatch
(cutlass/csrc/static_switch.h:17-138 BOOL/FP16/HEADDIM/BLOCKM/BLOCKN switches
+ kernel_traits.h:48-123 trait structs): a frozen dataclass holding the tile
geometry, plus a dispatch table keyed on (dtype, head_dim). Each entry
specializes a `pallas_call` exactly as each template instantiation specialized
a CUDA kernel — XLA traces/compiles one executable per static config.
"""

from __future__ import annotations

import dataclasses


import jax.numpy as jnp

LANES = 128      # TPU lane count: last-dim tile quantum
SUBLANES = 8     # fp32 sublane quantum (16 for bf16, 32 for int8/fp8)


@dataclasses.dataclass(frozen=True)
class FlashConfig:
    """Tile geometry for the flash-attention forward kernel.

    block_q / block_kv are the VMEM tile sizes along the two sequence dims —
    the analog of the reference's kBlockM/kBlockN (cutlass
    flash_attention.cu:726 fixes 64x64; triton uses 128x64 tiny_flash_attn_
    triton.py:19-20). On TPU both must be multiples of 128 to map onto the
    MXU/VPU T(8,128) layout.
    """
    block_q: int = 128
    block_kv: int = 128
    # Sub-tiles per KV block inside one grid step: sub-tile i+1's QK matmul
    # is independent of sub-tile i's softmax, giving Mosaic MXU/VPU overlap.
    kv_splits: int = 1
    # Independent online-softmax streams across sub-tiles (sub-tile i uses
    # stream i % streams), merged once per q row in the epilogue with the
    # exact LSE combine. streams=2 removes the m/l/acc data dependency
    # BETWEEN consecutive sub-tiles. MEASURED NEGATIVE on v5e (r2): 83.6
    # vs 102 TF/s causal at (2048, 512, splits=2) — the doubled stats/acc
    # working set costs more than the dependency break buys. Kept for
    # other chips/shapes; default 1.
    stats_streams: int = 1
    # Marks the kv grid dimension "arbitrary" (sequential) and the rest
    # "parallel" so megacores can split batch/head/q blocks.
    use_dimension_semantics: bool = True
    interpret: bool = False
    # Kernel family: "worklist" = the scalar-prefetched work-list grid
    # (ops/flash.py); "tri" = the one-shot triangle-decomposition kernel
    # (ops/flash_tri.py — causal, q_len == kv_len, VMEM-resident); "auto"
    # = tri when eligible, else worklist. Explicitly constructed configs
    # default to "worklist" so geometry sweeps measure what they name;
    # default_config() dispatches "auto".
    kernel: str = "worklist"
    # Column-chunk width for the tri kernel's sweep (width of the tall
    # unmasked rects) and the diagonal leaf size within a chunk:
    # scheduled/valid = 1/(1 + tri_leaf/S). v5e measured (s2048 GQA bf16):
    # sub=256 132.9 TF/s, 512 124.4, 128 96.7 (rect width dominates;
    # per-chunk overhead hurts below 256).
    tri_sub: int = 256
    tri_leaf: int = 0   # 0 = same as tri_sub

    def __post_init__(self):
        assert self.block_q % LANES == 0, self.block_q
        assert self.block_kv % LANES == 0, self.block_kv


# (dtype kind, head_dim) -> FlashConfig. The analog of FWD_HEADDIM_SWITCH
# (cutlass static_switch.h:39-66 enumerating 8 head dims). Defaults favor
# larger q tiles for small head dims (more rows per MXU pass), smaller for
# d=256 (VMEM pressure).
_DISPATCH: dict[tuple[str, int], FlashConfig] = {
    # tuned on v5e with device-side chained timing (block_q is the FOLDED
    # row budget: the kernel divides it by the GQA group so the q tile stays
    # ~block_q rows total). For CAUSAL, tall-but-bounded q tiles + 512-wide
    # kv tiles win: the q-block height sets the diagonal-triangle
    # quantization waste (~block_q_per_head/seqlen) while the tall block
    # amortizes per-grid-step overhead — the measured optimum of that
    # product is 2048 folded rows (102 TF/s s2048 d128 GQA).
    #
    # Keys are PADDED head dims (lane multiples): every d <= 128 rides the
    # 128 entry after pad-to-lane (so the ref's kHeadDim 32/64/96 switch
    # arms, static_switch.h:39-66, all land here), d in (128, 256] the 256
    # entry, d in (256, 384] the 384 entry. 384 is VMEM-scaled from the
    # 256 tuning (1.5x bytes/row), not measured on-chip.
    ("bfloat16", 128): FlashConfig(block_q=2048, block_kv=512, kv_splits=2),
    ("bfloat16", 256): FlashConfig(block_q=1024, block_kv=256),
    ("bfloat16", 384): FlashConfig(block_q=512, block_kv=256),
    ("float32", 128): FlashConfig(block_q=512, block_kv=512),
    ("float32", 256): FlashConfig(block_q=256, block_kv=256),
    ("float32", 384): FlashConfig(block_q=256, block_kv=128),
}

# NON-causal has no triangle to quantize, so the row budget grows until
# VMEM pushes back: folding the whole sequence into one grid step per
# (batch, kv-head) measured 157.7 TF/s (8192 rows, 1024-wide kv in 4
# sub-tiles) vs 138.6 at 2048 rows (v5e, s2048 d128 GQA) — per-step
# overhead amortizes over 4x the rows. kv_splits=4 keeps the materialized
# f32 score sub-tile at 8 MB; wider sub-tiles OOM VMEM at this row count.
_DISPATCH_NONCAUSAL: dict[tuple[str, int], FlashConfig] = {
    ("bfloat16", 128): FlashConfig(block_q=8192, block_kv=1024, kv_splits=4),
    ("bfloat16", 256): FlashConfig(block_q=4096, block_kv=256),
    ("bfloat16", 384): FlashConfig(block_q=2048, block_kv=256),
    ("float32", 128): FlashConfig(block_q=2048, block_kv=512),
    ("float32", 256): FlashConfig(block_q=1024, block_kv=256),
    ("float32", 384): FlashConfig(block_q=512, block_kv=128),
}


def default_config(dtype, head_dim: int, q_len: int, kv_len: int,
                   interpret: bool = False,
                   causal: bool = True) -> FlashConfig:
    """Pick a tile config for (dtype, head_dim), clamped to the problem size."""
    kind = jnp.dtype(dtype).name
    padded_d = max(_round_up(head_dim, LANES), LANES)
    table = _DISPATCH if causal else _DISPATCH_NONCAUSAL
    cfg = table.get((kind, padded_d), FlashConfig(block_q=128, block_kv=128))
    block_q = min(cfg.block_q, _round_up(q_len, LANES))
    block_kv = min(cfg.block_kv, _round_up(kv_len, LANES))
    return dataclasses.replace(cfg, block_q=block_q, block_kv=block_kv,
                               interpret=interpret, kernel="auto")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
