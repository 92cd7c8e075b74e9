"""Ring rotation/compute overlap guarantees (VERDICT r2 item 5).

The ring issues the NEXT block's ppermute BEFORE the current block's
attention (ring.py `ring`), the cross-chip analog of the reference's
async-load-next-K-during-gemm discipline (flash_attention_cutlass/csrc/
flash_attention.cu:585-590). Whether the transfer actually rides under
the MXU work is a backend scheduling decision — on TPU, XLA splits
ppermute into collective-permute-start/-done and hoists the start — but
it is only POSSIBLE if two properties hold, and both are asserted here:

1. Compiled dataflow independence: in the optimized HLO, no
   collective-permute transitively consumes attention compute (any `dot`)
   from the same module. A refactor that rotated the post-attention state
   (serializing the ring) would put a dot upstream of a permute and fail
   this test against the actual compiled artifact.
2. Issue order: in the traced program, every ppermute equation precedes
   the first attention equation of its ring step, so the scheduler SEES
   the rotation before the compute it should overlap.

(The CPU backend lowers ppermute synchronously — start/done pairs do not
exist to inspect — so the compiled-artifact check targets the dataflow
property that any schedule needs. The single-chip proxy measurement of
merge cost per ring step lives in benchmarks/ring_overlap_bench.py.)
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tiny_flash_attention_tpu.parallel.ring import (
    make_ring_attention, ring_attention_sharded)


def _mesh():
    devs = jax.devices()
    assert len(devs) >= 8
    return Mesh(np.asarray(devs[:8]).reshape(2, 4), ("data", "model"))


def test_compiled_permutes_independent_of_attention():
    """Optimized HLO: every collective-permute's transitive producer set
    is dot-free (rotation never waits on attention compute)."""
    mesh = _mesh()
    f = ring_attention_sharded(mesh, causal=True)
    q = jnp.zeros((2, 4, 512, 64), jnp.bfloat16)
    txt = f.lower(q, q, q).compile().as_text()

    # def-name -> (opcode, operand names) for every instruction
    insn = re.compile(r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s*=\s*[^=]*?"
                      r"([\w\-]+)\((.*)$")
    defs = {}
    for line in txt.splitlines():
        m = insn.match(line)
        if m:
            name, opcode, rest = m.groups()
            ops = re.findall(r"(%[\w.\-]+)", rest)
            defs[name] = (opcode, ops)

    permutes = [n for n, (op, _) in defs.items()
                if op == "collective-permute"]
    assert len(permutes) >= 6, (len(permutes), "expected k+v x (n-1) steps")

    # fusions may CONTAIN dots (attention); walking operands covers them
    # because a fusion's dot only matters if the fusion feeds the permute
    dotty = {n for n, (op, _) in defs.items() if op in ("dot", "fusion")
             and (op == "dot" or ".dot" in str(defs[n]))}

    def producers(name, seen):
        if name in seen or name not in defs:
            return
        seen.add(name)
        for o in defs[name][1]:
            producers(o, seen)

    for p in permutes:
        seen = set()
        for o in defs[p][1]:
            producers(o, seen)
        bad = [s for s in seen
               if defs.get(s, ("", []))[0] == "dot" or s in dotty]
        assert not bad, (
            f"collective-permute {p} transitively consumes attention "
            f"compute {bad[:3]} — the ring rotation has been serialized "
            f"behind the kernel")


def test_ppermute_issued_before_attention_each_step():
    """Traced program order: ring step s issues its rotation before its
    attention equations (jaxpr equation order is the issue order the
    compiler sees)."""
    mesh = _mesh()
    ring = make_ring_attention(mesh, axis_name="model", causal=False)
    q = jax.ShapeDtypeStruct((1, 2, 256, 64), jnp.bfloat16)

    def traced(q, k, v):
        return ring(q, k, v)

    with mesh:
        jaxpr = jax.make_jaxpr(
            jax.shard_map(
                traced, mesh=mesh,
                in_specs=(jax.P(None, None, "model", None),) * 3,
                out_specs=jax.P(None, None, "model", None),
                check_vma=False))(q, q, q)
    # the shard_map body jaxpr holds the ring equations
    body = None
    for eqn in jaxpr.eqns:
        if "jaxpr" in eqn.params and "ppermute" in str(eqn.params["jaxpr"]):
            body = eqn.params["jaxpr"]
            break
    assert body is not None, "shard_map body not found"
    eqns = body.eqns if hasattr(body, "eqns") else body.jaxpr.eqns
    order = [e.primitive.name for e in eqns]
    perm_idx = [i for i, n in enumerate(order) if n == "ppermute"]
    # attention calls are the jitted sub-programs containing matmuls
    attn_idx = [i for i, e in enumerate(eqns)
                if e.primitive.name in ("jit", "pjit", "pallas_call")
                and "dot_general" in str(e.params.get("jaxpr", ""))]
    assert perm_idx and attn_idx
    n_steps = len(perm_idx) // 2   # k and v per step
    # first rotation precedes the first attention call; every later
    # rotation pair precedes the NEXT step's attention
    assert perm_idx[0] < attn_idx[0], (perm_idx, attn_idx)
    for s in range(1, n_steps):
        later_attn = [i for i in attn_idx if i > perm_idx[2 * s]]
        assert later_attn, (s, perm_idx, attn_idx)
