"""ctypes binding for the native C++ CPU oracle (cpp/attn.cpp).

The reference binds its CPU tier with pybind11 (flash_attention_c/csrc/
ops.cu:4-8); this environment has no pybind11, so the binding is a C ABI +
ctypes, auto-building the shared library with `make` on first use.
"""

from __future__ import annotations

import ctypes
import math
import pathlib
import subprocess


import numpy as np

_CPP_DIR = pathlib.Path(__file__).resolve().parent.parent / "cpp"
_LIB_PATH = _CPP_DIR / "libtfa_cpu.so"
_lib = None


class _AttnParams(ctypes.Structure):
    _fields_ = [
        ("bs", ctypes.c_int64),
        ("hq", ctypes.c_int64),
        ("hkv", ctypes.c_int64),
        ("q_len", ctypes.c_int64),
        ("kv_len", ctypes.c_int64),
        ("d", ctypes.c_int64),
        ("causal", ctypes.c_int32),
        ("sm_scale", ctypes.c_float),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-s"], cwd=_CPP_DIR, check=True)
    _lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = ctypes.POINTER(ctypes.c_float)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    pp = ctypes.POINTER(_AttnParams)
    _lib.naive_attn_f32.argtypes = [f32p, f32p, f32p, f32p, f32p, pp]
    _lib.flash_attn_f32.argtypes = [f32p, f32p, f32p, f32p, f32p, pp]
    _lib.flash_attn_bf16.argtypes = [u16p, u16p, u16p, u16p, f32p, pp]
    _lib.flash_attn_fp16.argtypes = [u16p, u16p, u16p, u16p, f32p, pp]
    _lib.simd_width.restype = ctypes.c_int
    return _lib


def simd_width() -> int:
    return _load().simd_width()


def _params(q, k, causal, sm_scale):
    bs, hq, q_len, d = q.shape
    _, hkv, kv_len, _ = k.shape
    assert hq % hkv == 0
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    return _AttnParams(bs, hq, hkv, q_len, kv_len, d, int(causal),
                       float(sm_scale))


def _run_f32(fn, q, k, v, causal, sm_scale, return_lse):
    q = np.ascontiguousarray(q, np.float32)
    k = np.ascontiguousarray(k, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    p = _params(q, k, causal, sm_scale)
    out = np.empty_like(q)
    lse = np.empty(q.shape[:3], np.float32) if return_lse else None
    f32p = ctypes.POINTER(ctypes.c_float)
    fn(q.ctypes.data_as(f32p), k.ctypes.data_as(f32p),
       v.ctypes.data_as(f32p), out.ctypes.data_as(f32p),
       lse.ctypes.data_as(f32p) if return_lse else None, ctypes.byref(p))
    return (out, lse) if return_lse else out


def naive_attn(q, k, v, *, causal=False, sm_scale=None, return_lse=False):
    """Native 3-pass softmax attention (ref c/csrc/attn.cpp:35-98)."""
    return _run_f32(_load().naive_attn_f32, q, k, v, causal, sm_scale,
                    return_lse)


def flash_attn(q, k, v, *, causal=False, sm_scale=None, return_lse=False):
    """Native 1-pass streaming flash attention (ref c/csrc/attn.cpp:101-169).

    fp32 in/out; for bf16 use flash_attn_bf16.
    """
    return _run_f32(_load().flash_attn_f32, q, k, v, causal, sm_scale,
                    return_lse)


def _run_u16(fn, q, k, v, causal, sm_scale, return_lse):
    qb = np.ascontiguousarray(q).view(np.uint16)
    kb = np.ascontiguousarray(k).view(np.uint16)
    vb = np.ascontiguousarray(v).view(np.uint16)
    p = _params(q, k, causal, sm_scale)
    out = np.empty_like(qb)
    lse = np.empty(q.shape[:3], np.float32) if return_lse else None
    u16p = ctypes.POINTER(ctypes.c_uint16)
    f32p = ctypes.POINTER(ctypes.c_float)
    fn(qb.ctypes.data_as(u16p), kb.ctypes.data_as(u16p),
       vb.ctypes.data_as(u16p), out.ctypes.data_as(u16p),
       lse.ctypes.data_as(f32p) if return_lse else None, ctypes.byref(p))
    out = out.view(q.dtype)
    return (out, lse) if return_lse else out


def flash_attn_bf16(q, k, v, *, causal=False, sm_scale=None,
                    return_lse=False):
    """bf16 in/out with fp32 accumulation (ref archive attn.cpp:250-351)."""
    return _run_u16(_load().flash_attn_bf16, q, k, v, causal, sm_scale,
                    return_lse)


def flash_attn_fp16(q, k, v, *, causal=False, sm_scale=None,
                    return_lse=False):
    """fp16 in/out with fp32 accumulation (conversions: the archive's naive
    fp16<->fp32 routines, archive utils.cpp:105-136, made bit-exact)."""
    return _run_u16(_load().flash_attn_fp16, q, k, v, causal, sm_scale,
                    return_lse)
