#!/usr/bin/env python
"""Runs every benchmark suite and records all metrics to one JSON file.

The driver's BENCH_r{N}.json captures only bench.py's single headline line;
this collector persists the full matrix — attention configs, paged decode,
fp8 prefill, engine serving, training step — so each round's numbers are
reviewable side by side. Run on the TPU host:

    python benchmarks/run_all.py [-o benchmarks/RESULTS.json]

Each suite runs in its own subprocess (fresh compile cache namespace, and a
crash in one suite doesn't lose the rest); JSON lines on stdout are
collected, everything else passes through to stderr.
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Persistent XLA compilation cache shared by every suite subprocess:
# through the axon relay a fresh tri-kernel compile can take minutes, and
# suites re-compile identical executables. Harmless elsewhere.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
SUITES = [
    ("headline", [sys.executable, "-u", "bench.py"]),
    # --isolate: each attention row in its own subprocess so row order
    # cannot influence measurements (the round-2 int8 2x in-suite swing)
    ("attention", [sys.executable, "-u", "benchmarks/attention_bench.py",
                   "--isolate"]),
    ("engine", [sys.executable, "-u", "benchmarks/engine_bench.py"]),
    ("train", [sys.executable, "-u", "benchmarks/train_bench.py"]),
    ("jagged", [sys.executable, "-u", "benchmarks/jagged_prefill_bench.py"]),
    ("encoder", [sys.executable, "-u", "benchmarks/encoder_bench.py"]),
    ("ring_overlap", [sys.executable, "-u",
                      "benchmarks/ring_overlap_bench.py"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="benchmarks/RESULTS.json")
    ap.add_argument("--suites", default=None,
                    help="comma-separated subset of suite names")
    ap.add_argument("--merge", action="store_true",
                    help="keep the existing file's metrics for suites NOT "
                         "re-run (re-run suites are replaced wholesale)")
    args = ap.parse_args()
    want = set(args.suites.split(",")) if args.suites else None

    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         cwd=ROOT, capture_output=True, text=True
                         ).stdout.strip()
    results = {"git": rev, "ts": time.time(), "metrics": []}
    if args.merge and (ROOT / args.out).exists():
        prev = json.loads((ROOT / args.out).read_text())
        ran = want if want else {n for n, _ in SUITES}
        known = {n for n, _ in SUITES}
        for m in prev.get("metrics", []):
            # keep only metrics from suites that still exist and are not
            # being re-run; stamp each with the revision/time it was
            # actually measured at so merged files keep provenance
            if m.get("suite") in known - ran:
                m.setdefault("git", prev.get("git"))
                m.setdefault("ts", prev.get("ts"))
                results["metrics"].append(m)
    for name, cmd in SUITES:
        if want and name not in want:
            continue
        print(f"=== {name}", file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, cwd=ROOT, capture_output=True,
                                  text=True, timeout=7200)
        except subprocess.TimeoutExpired as e:
            # salvage whatever rows the suite printed before stalling —
            # relay compile stalls of 15-40 min per row are routine, and
            # one stuck suite must not lose the rest of the matrix
            for line in (e.stdout or b"").decode(errors="replace") \
                    .splitlines() if isinstance(e.stdout, bytes) else \
                    (e.stdout or "").splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    rec["suite"] = name
                    results["metrics"].append(rec)
            results["metrics"].append({
                "suite": name, "metric": f"{name}_suite_timeout",
                "value": 7200, "unit": "s"})
            print(f"=== {name} TIMED OUT", file=sys.stderr, flush=True)
            continue
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                rec["suite"] = name
                results["metrics"].append(rec)
                print(line, flush=True)
        if proc.returncode != 0:
            results["metrics"].append({
                "suite": name, "metric": f"{name}_suite_error",
                "value": proc.returncode, "unit": "exit_code"})
            print(proc.stderr[-2000:], file=sys.stderr)
        print(f"=== {name} done in {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)

    out = ROOT / args.out
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out} ({len(results['metrics'])} metrics)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
