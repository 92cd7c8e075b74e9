"""Two-OS-process DCN smoke, run end-to-end through the harness.

Everything else in the suite shares one address space; this is the only
test where a collective actually crosses a process boundary (the CPU
analog of DCN between TPU hosts). See benchmarks/multiprocess_smoke.py
for what is checked (train-step parity + cross-process ring attention).
"""

import json
import os
import subprocess
import sys


def test_two_process_dcn_smoke():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "benchmarks", "multiprocess_smoke.py")
    env = dict(os.environ, TFA_SMOKE_PORT="39213")
    # the conftest's platform forcing doesn't apply to subprocesses; the
    # harness sets its own env for the workers
    out = subprocess.run([sys.executable, script], env=env, cwd=repo,
                         capture_output=True, text=True, timeout=570)
    assert out.returncode == 0, out.stderr[-4000:] + out.stdout[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["ok"] and summary["processes"] == 2
    assert summary["loss_delta_vs_oracle"] < 1e-4
    assert summary["ring_maxerr"] < 2e-5
