"""Dtype-tiered tolerance helpers — the reference's correctness bars.

The reference checks every tier with `torch.allclose(rtol=0, atol=1e-2)` on
fp16-class data (main.py:95-99, cutlass/test.py:87, c/test.py:82-83) and
atol=1e-5 on fp32 standalone harnesses (cuda/standalone_src/helper.h:3-11).
Same ladder here, keyed on dtype.
"""

import jax.numpy as jnp
import numpy as np

_ATOL = {
    "float32": 2e-5,
    "bfloat16": 2e-2,
    "float16": 1e-2,
}


def tolerance_for(dtype) -> float:
    return _ATOL[jnp.dtype(dtype).name]


def assert_close(got, want, *, atol=None, rtol=0.0, name="output"):
    got = np.asarray(got, dtype=np.float32)
    want = np.asarray(want, dtype=np.float32)
    if atol is None:
        atol = 1e-2
    err = np.max(np.abs(got - want)) if got.size else 0.0
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    assert ok, f"{name}: max abs err {err:.3e} > atol {atol:.0e}"
