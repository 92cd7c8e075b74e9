"""Real-hardware correctness sweep: every kernel path vs the fp32 oracle.

The pytest suite runs on CPU (interpret mode + virtual mesh); this script is
the on-chip counterpart — the analog of the reference's standalone harnesses
asserting all_close on device (cuda standalone :396, cutlass standalone
:1023). Run with no args on the TPU host: prints one PASS/FAIL line per
surface and exits nonzero on any failure.

Stress mode (--epochs N): the analog of the reference's 1000-epoch
whole-test rerun (cuda v2 standalone :410-418) — every surface re-runs N
times with fresh RNG (compiles are cached after epoch 0, so epochs are
execution-only) and the per-surface error drift across epochs is reported;
NaNs or drift past the gate fail the run.
"""

import argparse
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import tiny_flash_attention_tpu as tfa
from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.flash_quant import flash_attention_quantized
from tiny_flash_attention_tpu.ops.quant import quantize_kv

FAILED = []
ERRS = {}           # name -> [err per epoch]
QUIET = False


def check(name, got, want, atol, relative=False):
    """Max-abs error gate; relative=True scales atol by max|want| (for
    gradients, whose magnitude depends on the loss normalization)."""
    want = np.asarray(want, np.float32)
    err = float(np.max(np.abs(np.asarray(got, np.float32) - want)))
    bound = atol * float(np.max(np.abs(want))) if relative else atol
    ok = err <= bound and np.isfinite(err)
    ERRS.setdefault(name, []).append(err)
    if not QUIET or not ok:
        print(f"{'PASS' if ok else 'FAIL'} {name}: maxerr {err:.2e} "
              f"(bound {bound:.0e})", flush=True)
    if not ok:
        FAILED.append(name)


def qkv(seed, bs, hq, hkv, ql, kl, d, dtype):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    return (jax.random.normal(k1, (bs, hq, ql, d), dtype),
            jax.random.normal(k2, (bs, hkv, kl, d), dtype),
            jax.random.normal(k3, (bs, hkv, kl, d), dtype))


def oracle(q, k, v, *, causal=False, window=None, segment_ids=None):
    """Dense fp32 oracle with kernel-identical masking semantics."""
    bs, hq, q_len, d = q.shape
    hkv, kv_len = k.shape[1], k.shape[2]
    if window is None and segment_ids is None:
        with jax.default_matmul_precision("highest"):
            return tfa.mha_reference(q.astype(jnp.float32),
                                     k.astype(jnp.float32),
                                     v.astype(jnp.float32), causal=causal)
    group = hq // hkv
    k = jnp.repeat(k, group, axis=1).astype(jnp.float32)
    v = jnp.repeat(v, group, axis=1).astype(jnp.float32)
    with jax.default_matmul_precision("highest"):
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k)
    s = s / math.sqrt(d)
    qpos = jnp.arange(q_len)[:, None] + (kv_len - q_len)
    kpos = jnp.arange(kv_len)[None, :]
    mask = jnp.ones((q_len, kv_len), bool)
    if causal:
        mask &= kpos <= qpos
    if window is not None:
        mask &= kpos > qpos - window
    mask = mask[None, None]
    if segment_ids is not None:
        qs, ks = segment_ids
        mask &= qs[:, None, :, None] == ks[:, None, None, :]
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(s - m))
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(l == 0.0, 1.0, l)
    with jax.default_matmul_precision("highest"):
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def main(seed0=0):

    # headline shape: bf16 GQA causal (BASELINE config 1)
    q, k, v = qkv(seed0, 2, 8, 2, 2048, 2048, 128, jnp.bfloat16)
    check("bf16 gqa causal s2048 d128",
          flash_attention(q, k, v, causal=True), oracle(q, k, v, causal=True),
          2e-2)

    # non-causal at the same shape: exercises the whole-sequence row-fold
    # dispatch default (block_q=8192 folded, kv 1024/4 — round 2)
    check("bf16 gqa NON-causal s2048 d128 (row-fold dispatch)",
          flash_attention(q, k, v, causal=False), oracle(q, k, v),
          2e-2)

    # both kernel families at the headline shape, regardless of dispatch:
    # the auto route picks tri for plain causal prefill; pin each
    from tiny_flash_attention_tpu.ops.configs import FlashConfig
    check("bf16 causal s2048 TRI kernel (forced)",
          flash_attention(q, k, v, causal=True,
                          config=FlashConfig(kernel="tri")),
          oracle(q, k, v, causal=True), 2e-2)
    check("bf16 causal s2048 WORKLIST kernel (forced)",
          flash_attention(q, k, v, causal=True,
                          config=FlashConfig(block_q=2048, block_kv=512,
                                             kv_splits=2)),
          oracle(q, k, v, causal=True), 2e-2)
    check("bf16 causal s2048 TRI_BLOCK kernel (forced q-banded sweep)",
          flash_attention(q, k, v, causal=True,
                          config=FlashConfig(kernel="tri_block")),
          oracle(q, k, v, causal=True), 2e-2)

    # s8192: past the one-shot tri VMEM gate — the auto route must land
    # on the q-banded kernel (dynamic rect fori_loop on chip)
    q8, k8, v8 = qkv(seed0 + 5, 1, 8, 2, 8192, 8192, 128, jnp.bfloat16)
    check("bf16 gqa causal s8192 d128 (auto -> tri_block)",
          flash_attention(q8, k8, v8, causal=True),
          oracle(q8, k8, v8, causal=True), 2e-2)
    del q8, k8, v8

    # off-table head dims (ref enumerates kHeadDim 32..256,
    # static_switch.h:39-66): d=96 rides the pad-to-128 path, d=192 the
    # pad-to-256 path — on-chip coverage for the padding correctness
    for dd in (96, 192):
        q9, k9, v9 = qkv(seed0 + 7 + dd, 2, 8, 2, 2048, 2048, dd,
                         jnp.bfloat16)
        check(f"bf16 gqa causal s2048 d{dd} (padded head dim)",
              flash_attention(q9, k9, v9, causal=True),
              oracle(q9, k9, v9, causal=True), 2e-2)

    # decode shape (q_len != kv_len), non-causal segments-free
    qd, kd, vd = qkv(seed0 + 1, 1, 8, 2, 128, 2048, 128, jnp.bfloat16)
    check("bf16 decode-shape causal",
          flash_attention(qd, kd, vd, causal=True),
          oracle(qd, kd, vd, causal=True), 2e-2)

    # sliding window
    check("bf16 window 512 s2048",
          flash_attention(q, k, v, causal=True, window=512),
          oracle(q, k, v, causal=True, window=512), 2e-2)

    # packed segments
    seg = jnp.asarray([[1] * 1200 + [2] * 848] * 2, jnp.int32)
    check("bf16 segments",
          flash_attention(q, k, v, causal=True, segment_ids=(seg, seg)),
          oracle(q, k, v, causal=True, segment_ids=(seg, seg)), 2e-2)

    # fp32 path (tighter gate, ref helper.h:3-11 class)
    qf, kf, vf = qkv(seed0 + 2, 1, 4, 4, 1024, 1024, 128, jnp.float32)
    check("fp32 causal s1024",
          flash_attention(qf, kf, vf, causal=True),
          oracle(qf, kf, vf, causal=True), 2e-4)

    # fp16 surface: promoted to fp32 compute (ops/flash.py), so it clears
    # the reference's atol=1e-2 fp16 gate (flash_attention_py/main.py:95-99)
    # vs the fp32 oracle — the residual is fp16 input/output rounding only.
    qh, kh, vh = (x.astype(jnp.float16) for x in (qf, kf, vf))
    check("fp16 causal s1024 (fp32 compute)",
          flash_attention(qh, kh, vh, causal=True),
          oracle(qh, kh, vh, causal=True), 1e-2)

    # int8 + fp8 quantized KV: compare against the oracle run on the
    # DEQUANTIZED cache so the gate measures kernel error, not quantization
    # noise (e4m3's 3-bit mantissa alone contributes ~6% on K/V).
    for fmt in ("int8", "fp8"):
        kq_, vq_ = quantize_kv(k, v, fmt)
        kd_, vd_ = kq_.dequantize(jnp.float32), vq_.dequantize(jnp.float32)
        check(f"{fmt}-KV causal s2048 (vs dequantized oracle)",
              flash_attention_quantized(q, kq_, vq_, causal=True),
              oracle(q, kd_, vd_, causal=True), 2e-2)

    # token-append path on chip: the dispatched XLA scatter (serving path,
    # inference._append_rows) vs the Pallas DMA kernel. Current Mosaic
    # rejects the kernel's single-row DMA windows ("slice shape must be
    # aligned to tiling") — when it does, the kernel side runs in
    # interpret mode so the on-chip scatter is still validated, and the
    # row says so.
    from tiny_flash_attention_tpu.ops.paged_fused import (
        fused_page_append, scale_rows_per_side)
    from tiny_flash_attention_tpu.models.inference import _append_rows_scatter
    for fmt_a, ps_a in (("bf16", 128), ("int8", 128), ("int8", 64)):
        d_a, hkv_a, B_a, np_a = 128, 2, 3, 8
        prows = 2 * ps_a + (2 * scale_rows_per_side(ps_a, d_a)
                            if fmt_a == "int8" else 0)
        dt_a = jnp.int8 if fmt_a == "int8" else jnp.bfloat16
        ka, kb, kc = jax.random.split(jax.random.key(seed0 + 31 + ps_a), 3)
        pg = jax.random.randint(ka, (hkv_a, np_a, prows, d_a), -5,
                                5).astype(dt_a)
        kn = jax.random.normal(kb, (B_a, hkv_a, d_a), jnp.float32)
        vn = jax.random.normal(kc, (B_a, hkv_a, d_a), jnp.float32)
        pids = jnp.asarray([0, 3, 7], jnp.int32)
        rws = jnp.asarray([0, ps_a // 2, ps_a - 1], jnp.int32)
        tag_a = "DMA vs scatter"
        try:
            got_a = fused_page_append(pg, kn, vn, pids, rws, page_size=ps_a)
        except Exception:  # Mosaic sub-tile DMA rejection
            got_a = fused_page_append(pg, kn, vn, pids, rws, page_size=ps_a,
                                      interpret=True)
            tag_a = "scatter vs interp DMA; Mosaic rejects sub-tile DMA"
        want_a = _append_rows_scatter(pg, kn, vn, pids, rws,
                                      page_size=ps_a, fmt=fmt_a)
        # payload exact; scale bytes may differ by 1 f32 ulp (different
        # fusion contexts lower amax/127 differently) — decode and
        # compare as floats
        pay = np.array_equal(np.asarray(got_a[:, :, :2 * ps_a]),
                             np.asarray(want_a[:, :, :2 * ps_a]))
        sc_err = 0.0
        if fmt_a == "int8":
            def dec(x):
                b = np.swapaxes(np.asarray(x[:, :, 2 * ps_a:], np.int8),
                                -1, -2).copy()
                return b.view(np.float32)
            gsc, wsc = dec(got_a), dec(want_a)
            pay &= bool(np.array_equal(np.isfinite(gsc), np.isfinite(wsc)))
            both = np.isfinite(gsc) & np.isfinite(wsc)
            sc_err = float(np.max(np.abs(gsc[both] - wsc[both]) /
                                  np.maximum(np.abs(wsc[both]), 1e-30)))
        check(f"page append {fmt_a} ps{ps_a} ({tag_a})",
              jnp.asarray([float(pay), sc_err * 1e5]),
              jnp.asarray([1.0, 0.0]), 0.5)

    # backward: grads vs oracle grads
    def sqloss(fn):
        return lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2) / a[0].size

    g_k = jax.grad(sqloss(lambda q, k, v: flash_attention(q, k, v, causal=True)),
                   argnums=(0, 1, 2))(q, k, v)
    g_o = jax.grad(sqloss(lambda q, k, v: oracle(q, k, v, causal=True)),
                   argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), g_k, g_o):
        check(f"bwd {name}", a, b, 3e-2, relative=True)

    # banded triangle backward (forced tri_block routes the vjp to the
    # row-banded grid): s4096 -> 2 bands of 2048 rows, so dk/dv really
    # accumulate across sequential band steps on chip
    qb, kb, vb = qkv(seed0 + 9, 1, 8, 2, 4096, 4096, 128, jnp.bfloat16)
    g_b = jax.grad(
        sqloss(lambda q, k, v: flash_attention(
            q, k, v, causal=True, config=FlashConfig(kernel="tri_block"))),
        argnums=(0, 1, 2))(qb, kb, vb)
    g_bo = jax.grad(sqloss(lambda q, k, v: oracle(q, k, v, causal=True)),
                    argnums=(0, 1, 2))(qb, kb, vb)
    for name, a, b in zip(("dq", "dk", "dv"), g_b, g_bo):
        check(f"bwd {name} s4096 (banded tri grid)", a, b, 3e-2,
              relative=True)

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1,
                    help="stress reruns of the whole sweep with fresh RNG")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    for epoch in range(args.epochs):
        QUIET = epoch > 0
        main(seed0=epoch * 100)
        if args.epochs > 1:
            print(f"stress epoch {epoch} done", flush=True)
    if args.epochs > 1:
        print("error drift across epochs (max-min | gate-relative):")
        for name, errs in ERRS.items():
            print(f"  {name}: min {min(errs):.2e} max {max(errs):.2e} "
                  f"spread {max(errs) - min(errs):.2e}")
    if FAILED:
        print("FAILED:", ", ".join(sorted(set(FAILED))))
        sys.exit(1)
    print(f"all hardware checks passed ({args.epochs} epoch(s))")
