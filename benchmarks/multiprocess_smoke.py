"""Two-process DCN smoke: the repo's distributed stack across REAL process
boundaries.

The 8-device virtual mesh used everywhere else is single-process — GSPMD
partitions, but every collective stays in one address space. This harness
spawns N=2 OS processes (2 CPU devices each), wires them through
``initialize_multihost`` (the same fail-fast entry a v5e-16 pod uses,
parallel/multihost.py), builds the hybrid mesh with the dcn axis across
processes, and checks numerics end-to-end:

  1. sharded TRAIN STEP (dp over DCN x tp over "ICI"): 3 SGD steps, loss
     sequence must match a single-process oracle;
  2. RING ATTENTION with the context axis across processes — every K/V
     rotation is a cross-process collective-permute — vs the local
     reference oracle.

Reference analog: none (tiny-flash-attention is single-process; SURVEY.md
section 2.6) — this is the TPU-native multihost extension's smoke test.

Run: ``python benchmarks/multiprocess_smoke.py`` (drives both workers).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

PORT = int(os.environ.get("TFA_SMOKE_PORT", "39117"))
NPROC = 2
STEPS = 3
SEED_PARAMS, SEED_TOKENS, SEED_RING = 0, 2, 7


def _model_cfg(T, jnp):
    return T.ModelConfig(
        vocab_size=128, d_model=128, n_layers=2, n_q_heads=4, n_kv_heads=2,
        d_head=128, d_ff=256, dtype=jnp.float32, attn_impl="reference")


def _train_inputs(T, jax, jnp):
    cfg = _model_cfg(T, jnp)
    params = T.init_params(cfg, jax.random.key(SEED_PARAMS))
    toks = jax.random.randint(jax.random.key(SEED_TOKENS), (8, 64), 0, 128)
    return cfg, params, toks


def _serve_inputs(T, jax, jnp):
    """Decode-loop inputs for the 2-group DP serving check: 4 slots, page
    pool split into two groups of 6 pages (page 0/6 are each group's
    scratch), all as host numpy so every process passes identical values."""
    import numpy as np
    cfg = T.ModelConfig(
        vocab_size=256, d_model=128, n_layers=2, n_q_heads=4, n_kv_heads=2,
        d_head=128, d_ff=256, dtype=jnp.float32, attn_impl="flash")
    params = T.init_params(cfg, jax.random.key(11))
    pages0 = [np.zeros((cfg.n_kv_heads, 12, 2 * 128, cfg.d_head),
                       np.float32) for _ in range(cfg.n_layers)]
    table = np.asarray([[1, 2], [3, 4], [7, 8], [9, 10]], np.int32)
    tok0 = np.asarray([3, 77, 5, 200], np.int32)
    pos0 = np.zeros((4,), np.int32)
    temps = np.asarray([0.7, 1.1, 0.9, 1.3], np.float32)
    return cfg, params, pages0, tok0, pos0, table, temps


def worker(idx: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tiny_flash_attention_tpu.parallel.multihost import (
        initialize_multihost, make_hybrid_mesh)
    initialize_multihost(f"localhost:{PORT}", NPROC, idx)
    assert jax.process_count() == NPROC, jax.process_count()
    assert len(jax.devices()) == 2 * NPROC, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tiny_flash_attention_tpu.models import transformer as T
    from tiny_flash_attention_tpu.parallel.train import make_train_step
    from tiny_flash_attention_tpu.parallel.ring import ring_attention_sharded
    from tiny_flash_attention_tpu.ops.reference import mha_reference

    # --- train step: dp across processes (DCN), tp within (ICI) ---
    mesh = make_hybrid_mesh(ici_axes=("model",), ici_shape=(2,),
                            num_slices=NPROC)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": NPROC, "model": 2}, mesh
    cfg, params, toks = _train_inputs(T, jax, jnp)
    train_step, init_state = make_train_step(cfg, mesh,
                                             optimizer=optax.sgd(1e-2))
    state = init_state(params)
    toks = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    losses = []
    for _ in range(STEPS):
        *state, loss = train_step(*state, toks)
        losses.append(float(loss))

    # --- ring attention: ctx axis ACROSS processes ---
    ring_mesh = make_hybrid_mesh(ici_axes=("data",), ici_shape=(2,),
                                 dcn_axis="ctx", num_slices=NPROC,
                                 axis_order=("data", "ctx"))
    kq, kk, kv = jax.random.split(jax.random.key(SEED_RING), 3)
    q = jax.random.normal(kq, (2, 2, 256, 64), jnp.float32)
    k = jax.random.normal(kk, (2, 2, 256, 64), jnp.float32)
    v = jax.random.normal(kv, (2, 2, 256, 64), jnp.float32)
    want = mha_reference(q, k, v, causal=True)
    ring = ring_attention_sharded(ring_mesh, causal=True, ctx_axis="ctx")
    spec = NamedSharding(ring_mesh, P("data", None, "ctx", None))
    got = ring(*(jax.device_put(x, spec) for x in (q, k, v)))
    # replicate so every process can read the full result
    got = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(ring_mesh, P()))(got)
    ring_err = float(np.max(np.abs(np.asarray(got) - np.asarray(want))))

    # --- sharded serving decode: dp ACROSS processes x tp within ---
    # (BASELINE config 4: multi-host continuous-batching decode). Inputs
    # are host numpy (identical on every process) so jit can shard them
    # onto the global mesh; the decode loop all-gathers the sampled
    # stream over `data`, so each process reads the full token block.
    from tiny_flash_attention_tpu.parallel.serve import (
        make_sharded_decode_loop)
    scfg, sparams, pages0, tok0, pos0, table, temps = _serve_inputs(
        T, jax, jnp)
    serve_tokens = {}
    for greedy in (True, False):
        loop = make_sharded_decode_loop(
            scfg, mesh, page_size=128, fmt="bf16", n_steps=6,
            greedy=greedy, data_axis="data")
        t = np.zeros_like(temps) if greedy else temps
        _, sampled = loop(sparams, [p.copy() for p in pages0], tok0, pos0,
                          table, t, jax.random.key(9))
        serve_tokens["greedy" if greedy else "sampled"] = \
            np.asarray(sampled).tolist()

    print(json.dumps({"process": idx, "losses": losses,
                      "ring_maxerr": ring_err,
                      "serve_tokens": serve_tokens}), flush=True)


def oracle_serve_tokens():
    """Single-process, single-device decode_loop oracle for the serving
    check — the sharded DP x TP loop must be token-exact against this."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from tiny_flash_attention_tpu.models import transformer as T
    from tiny_flash_attention_tpu.models.inference import decode_loop

    cfg, params, pages0, tok0, pos0, table, temps = _serve_inputs(
        T, jax, jnp)
    out = {}
    for greedy in (True, False):
        t = np.zeros_like(temps) if greedy else temps
        _, tokens, _ = decode_loop(
            cfg, params, [jnp.asarray(p) for p in pages0], tok0, pos0,
            table, t, jax.random.key(9),
            page_size=128, fmt="bf16", n_steps=6, greedy=greedy)
        out["greedy" if greedy else "sampled"] = np.asarray(tokens).tolist()
    return out


def oracle_losses():
    """Single-process, single-device oracle for the same 3 SGD steps."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from tiny_flash_attention_tpu.models import transformer as T

    cfg, params, toks = _train_inputs(T, jax, jnp)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    losses = []
    step = jax.jit(lambda p, s: _sgd_step(T, optax, opt, cfg, p, s, toks))
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return losses


def _sgd_step(T, optax, opt, cfg, params, opt_state, toks):
    import jax
    loss, grads = jax.value_and_grad(
        lambda p: T.loss_fn(cfg, p, toks))(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(NPROC)]
    t0 = time.time()
    outs = [p.communicate(timeout=600) for p in procs]
    elapsed = time.time() - t0
    results = []
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"worker {i} FAILED rc={p.returncode}\n{err[-4000:]}",
                  file=sys.stderr)
            return 1
        results.append(json.loads(out.strip().splitlines()[-1]))

    want = oracle_losses()
    want_serve = oracle_serve_tokens()
    ok = True
    for r in results:
        dl = max(abs(a - b) for a, b in zip(r["losses"], want))
        serve_ok = r.get("serve_tokens") == want_serve
        ok &= dl < 1e-4 and r["ring_maxerr"] < 2e-5 and serve_ok
        print(f"process {r['process']}: losses {r['losses']} "
              f"(|d| vs oracle {dl:.2e}), ring maxerr "
              f"{r['ring_maxerr']:.2e}, serve token-exact: {serve_ok}")
    print(json.dumps({
        "suite": "multiprocess_smoke", "processes": NPROC,
        "devices_global": 2 * NPROC, "train_steps": STEPS,
        "loss_delta_vs_oracle": max(
            max(abs(a - b) for a, b in zip(r["losses"], want))
            for r in results),
        "ring_maxerr": max(r["ring_maxerr"] for r in results),
        "serve_token_exact": all(r.get("serve_tokens") == want_serve
                                 for r in results),
        "elapsed_s": round(elapsed, 1), "ok": ok}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker)
    else:
        sys.exit(main())
