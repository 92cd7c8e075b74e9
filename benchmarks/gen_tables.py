#!/usr/bin/env python
"""Regenerates every published results table from benchmarks/RESULTS.json.

RESULTS.json (written by run_all.py on the TPU host) is the single source
of truth for measured numbers; README.md and BASELINE.md contain

    <!-- AUTOGEN:RESULTS -->
    ...generated table...
    <!-- /AUTOGEN:RESULTS -->

blocks that this script rewrites verbatim from the recorded metrics, so no
two documents can disagree (round-2 verdict item 4). Run after run_all.py:

    python benchmarks/gen_tables.py
"""

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

# metric name -> (label, note). Metrics not listed render in the compact
# tail table so nothing measured goes unpublished.
CURATED = [
    ("flash_attn_fwd_bf16_gqa_causal_s2048_d128_tflops_per_chip",
     "Flash fwd, causal GQA s2048 d128 (headline)",
     "median of N device-chained rounds; `best`/`spread` recorded"),
    ("cfg1_bf16_gqa_causal_s2048_d128_tflops",
     "Flash fwd, causal GQA s2048 d128 (suite)",
     "vs naive fused-XLA attention on the same chip"),
    ("bf16_gqa_causal_s4096_d128_tflops",
     "Flash fwd, causal GQA s4096 d128", ""),
    ("bf16_gqa_causal_s8192_d128_tflops",
     "Flash fwd, causal GQA s8192 d128",
     "q-banded triangle sweep (tri_block)"),
    ("window_w1024_s8192_tri_block_tflops",
     "Sliding window w1024 s8192 (tri_block)",
     "valid-FLOP TF/s; vs_baseline = speedup over the work-list grid"),
    ("noncausal_bf16_gqa_s2048_d128_tflops",
     "Flash fwd, non-causal s2048 d128",
     "whole-sequence row fold"),
    ("int8_kv_causal_prefill_s2048_tflops",
     "INT8-KV fwd, causal s2048",
     "vs_baseline = ratio to the bf16 kernel in the same run"),
    ("fp8_kv_chunked_prefill_s32k_tflops",
     "FP8-KV chunked prefill s32k", "bit-surgery dequant"),
    ("paged_decode_bf16_s8k_kv_bandwidth",
     "Paged decode bf16 s8k, KV bandwidth", "~v5e HBM is 819 GB/s"),
    ("paged_decode_int8_s8k_steps_per_s",
     "Paged decode int8 s8k", ""),
    ("engine_decode_bf16_b8_tokens_per_s",
     "Engine decode bf16 (4-layer model, batch 8)",
     "best chunk; `median` recorded alongside"),
    ("engine_decode_int8_b8_tokens_per_s",
     "Engine decode int8 KV", ""),
    ("engine_decode_int8_wint8_b8_tokens_per_s",
     "Engine decode int8 KV + int8 weights", ""),
    ("engine_bf16_vs_stock_dense_decode_s3584",
     "Engine vs stock dense decode, prompt 3584", "x stock-JAX yardstick"),
    ("engine_bf16_vs_stock_dense_decode_s8k",
     "Engine vs stock dense decode, prompt ~8k (bf16)",
     "north-star regime"),
    ("engine_int8_vs_stock_dense_decode_s8k",
     "Engine vs stock dense decode, prompt ~8k (int8 KV)", ""),
    ("train_step_bf16_b4_s2048_tokens_per_s",
     "Train step (data, model) GSPMD, one chip", ""),
    ("train_step_bf16_b1_s8192_tokens_per_s",
     "Train step s8192 (banded triangle fwd+bwd)", ""),
]


def fmt_val(rec):
    v = rec.get("value")
    unit = rec.get("unit", "")
    s = f"**{v:g}** {unit}" if isinstance(v, (int, float)) else f"{v} {unit}"
    extras = []
    for k in ("best", "median", "spread", "vs_baseline"):
        if k in rec and rec[k] is not None:
            extras.append(f"{k} {rec[k]:g}")
    return s + (f" ({', '.join(extras)})" if extras else "")


def render(results):
    by_name = {}
    for rec in results["metrics"]:
        by_name.setdefault(rec["metric"], rec)   # first occurrence wins
    lines = [
        f"*Generated from `benchmarks/RESULTS.json` "
        f"(git `{results.get('git', '?')}`) by `benchmarks/gen_tables.py` "
        f"— do not edit by hand.*", "",
        "| Metric | Measured | Notes |", "|---|---|---|",
    ]
    used = set()
    for name, label, note in CURATED:
        rec = by_name.get(name)
        if rec is None:
            continue
        used.add(name)
        lines.append(f"| {label} | {fmt_val(rec)} | {note} |")
    tail = [n for n in by_name if n not in used
            and not n.endswith("_suite_error")]
    if tail:
        lines += ["", "<details><summary>All other recorded metrics"
                  "</summary>", "", "| Metric | Measured |", "|---|---|"]
        lines += [f"| `{n}` | {fmt_val(by_name[n])} |" for n in sorted(tail)]
        lines += ["", "</details>"]
    return "\n".join(lines)


def splice(path: pathlib.Path, block: str) -> bool:
    text = path.read_text()
    pat = re.compile(r"(<!-- AUTOGEN:RESULTS -->\n)(?:.*?\n)??"
                     r"(<!-- /AUTOGEN:RESULTS -->)", re.S)
    if not pat.search(text):
        return False
    path.write_text(pat.sub(
        lambda m: m.group(1) + block + "\n" + m.group(2), text))
    return True


def main():
    results = json.loads((ROOT / "benchmarks/RESULTS.json").read_text())
    block = render(results)
    for name in ("README.md", "BASELINE.md"):
        ok = splice(ROOT / name, block)
        print(f"{name}: {'updated' if ok else 'NO AUTOGEN BLOCK'}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
