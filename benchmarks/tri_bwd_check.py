"""On-chip check + timing of the one-shot triangle backward.

Verifies tri_flash_bwd at the headline shape against the work-list
backward (which hw_check already gates against the fp32 oracle), then
times a full fwd+bwd via the dispatched custom VJP.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.ops.flash import flash_attention
from tiny_flash_attention_tpu.ops.flash_tri import tri_flash_fwd
from tiny_flash_attention_tpu.ops.flash_tri_bwd import (
    tri_flash_bwd, tri_bwd_eligible, _pick_splits)
from tiny_flash_attention_tpu.utils.benchmarking import run_benchmark


def main():
    bs, hq, hkv, s, d = 2, 8, 2, 2048, 128
    if len(sys.argv) > 1:
        s = int(sys.argv[1])
    dtype = jnp.bfloat16
    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(k1, (bs, hq, s, d), dtype)
    k = jax.random.normal(k2, (bs, hkv, s, d), dtype)
    v = jax.random.normal(k3, (bs, hkv, s, d), dtype)
    do = jax.random.normal(k4, (bs, hq, s, d), dtype)
    sm = d ** -0.5
    print("eligible:", tri_bwd_eligible(q.shape, hkv, s, True, None, None,
                                        None, dtype),
          "splits:", _pick_splits(hq // hkv, s, d, 2), flush=True)

    t0 = time.time()
    out, lse = jax.jit(lambda q, k, v: tri_flash_fwd(
        q, k, v, sm_scale=sm, sub=256))(q, k, v)
    jax.block_until_ready(out)
    print(f"fwd compile+run {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    grads = jax.jit(lambda *a: tri_flash_bwd(*a, sm_scale=sm, sub=256))(
        q, k, v, out, lse, do)
    _ = [np.asarray(g[0, 0, 0, :1]) for g in grads]
    print(f"bwd compile+run {time.time()-t0:.1f}s", flush=True)

    # reference grads via the work-list kernel's custom VJP (hw_check
    # gates that path against the fp32 oracle on-chip)
    def loss_wl(q, k, v):
        return (flash_attention(q, k, v, causal=True, sm_scale=sm)
                .astype(jnp.float32) * do.astype(jnp.float32)).sum()

    ref = jax.jit(jax.grad(loss_wl, argnums=(0, 1, 2)))(q, k, v)
    names = ["dq", "dk", "dv"]
    ok = True
    for n, a, b in zip(names, grads, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-6)
        print(f"{n}: rel-max-err {err:.4f}", flush=True)
        ok &= err < 4e-2
    print("MATCH" if ok else "MISMATCH", flush=True)

    # timing: fwd+bwd chained (thread every output through the carry)
    def fwdbwd(q, k, v):
        o, l = tri_flash_fwd(q, k, v, sm_scale=sm, sub=256)
        return tri_flash_bwd(q, k, v, o, l, do, sm_scale=sm, sub=256)

    r = run_benchmark(fwdbwd, (q, k, v))
    flops = 14 * bs * hq * s * s * d * 0.5   # 4 fwd + 10 bwd matmul flops
    print(f"tri fwd+bwd: {r['min_ms']:.3f} ms  "
          f"{flops / (r['min_ms'] / 1e3) / 1e12:.1f} TF/s", flush=True)

    def fwdbwd_wl(q, k, v):
        return jax.grad(loss_wl, argnums=(0, 1, 2))(q, k, v)

    r2 = run_benchmark(fwdbwd_wl, (q, k, v))
    print(f"worklist fwd+bwd: {r2['min_ms']:.3f} ms  "
          f"{flops / (r2['min_ms'] / 1e3) / 1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
