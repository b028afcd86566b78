"""ctypes loader for the native C++ emulation cores (csrc/emu_gemm.cpp).

Builds the shared library on first use with g++ (no pybind11 in this
environment; C ABI + ctypes keeps the binding dependency-free).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _ROOT / "csrc" / "emu_gemm.cpp"
_BUILD = _ROOT / "csrc" / "build"
_LIB = _BUILD / "libemu_gemm.so"

_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _BUILD.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
            check=True)
    lib = ctypes.CDLL(str(_LIB))
    fp = ctypes.POINTER(ctypes.c_float)
    for name in ("emu_gemm_nocor", "emu_gemm_cor", "emu_gemm_mixed"):
        fn = getattr(lib, name)
        fn.argtypes = [fp, fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int]
        fn.restype = None
    lib.emu_clip_mantissa.argtypes = [ctypes.c_float, ctypes.c_int]
    lib.emu_clip_mantissa.restype = ctypes.c_float
    _lib = lib
    return lib


def _gemm(name: str, a: np.ndarray, b: np.ndarray, bits: int) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    c = np.empty((m, n), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    getattr(lib, name)(a.ctypes.data_as(fp), b.ctypes.data_as(fp),
                       c.ctypes.data_as(fp), m, n, k, bits)
    return c


def emu_gemm_nocor(a, b, bits: int = 7) -> np.ndarray:
    return _gemm("emu_gemm_nocor", a, b, bits)


def emu_gemm_cor(a, b, bits: int = 7) -> np.ndarray:
    return _gemm("emu_gemm_cor", a, b, bits)


def emu_gemm_mixed(a, b, bits: int = 7) -> np.ndarray:
    return _gemm("emu_gemm_mixed", a, b, bits)


def clip_mantissa_scalar(x: float, bits: int) -> float:
    return float(_load().emu_clip_mantissa(ctypes.c_float(x), bits))
