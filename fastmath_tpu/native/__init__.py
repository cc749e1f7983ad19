"""Native CPU tier: ctypes bindings to the C++ compact-symmetric
kernels (the jitfields-CPU analog; see ``sym_cpu.cpp``).

The shared library builds on first import with g++ if missing (mirrors
jitfields' JIT-compile-on-demand model, reference
``docs/md/install.md:8-18``); set ``FASTMATH_TPU_NO_NATIVE=1`` to
disable. Thread count is controlled with :func:`set_num_threads`
(analog of ``jitfields.set_num_threads``, reference
``tests/utils.py:28``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "available",
    "build",
    "set_num_threads",
    "get_num_threads",
    "sym_matvec_np",
    "sym_addmatvec_np",
    "sym_submatvec_np",
    "sym_solve_np",
    "sym_invert_np",
]

_HERE = Path(__file__).parent
_SRC = _HERE / "sym_cpu.cpp"
_LIB = _HERE / "libfastmath_sym.so"
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the shared library with g++ (O3, OpenMP when available).

    Lazy: runs on the first native *call* (never at import), and
    rebuilds when ``sym_cpu.cpp`` is newer than the binary. The binary
    is gitignored — never committed.
    """
    if _LIB.exists() and not force:
        try:
            if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
                return True
        except OSError:
            return True
    cmds = [
        ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
        ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
    ]
    for cmd in cmds:
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("FASTMATH_TPU_NO_NATIVE"):
        return None
    # build() no-ops when the binary exists AND is newer than the
    # source — calling it unconditionally is what makes the staleness
    # rebuild actually reachable
    if not build():
        return None
    lib = ctypes.CDLL(str(_LIB))
    i64, i32 = ctypes.c_int64, ctypes.c_int
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    for suffix, p in (("f32", f32p), ("f64", f64p)):
        getattr(lib, f"sym_matvec_{suffix}").argtypes = [p, p, p, i64, i32]
        getattr(lib, f"sym_addmatvec_{suffix}").argtypes = [p, p, p, p, i64,
                                                            i32]
        getattr(lib, f"sym_submatvec_{suffix}").argtypes = [p, p, p, p, i64,
                                                            i32]
        getattr(lib, f"sym_solve_{suffix}").argtypes = [p, p, p, i64, i32]
        getattr(lib, f"sym_invert_{suffix}").argtypes = [p, p, i64, i32]
    lib.fastmath_num_threads.restype = i32
    lib.fastmath_set_num_threads.argtypes = [i32]
    _lib = lib
    return lib


def available() -> bool:
    """True when the native library loads (builds on demand)."""
    return _load() is not None


def set_num_threads(n: int) -> None:
    lib = _load()
    if lib is not None:
        lib.fastmath_set_num_threads(int(n))


def get_num_threads() -> int:
    lib = _load()
    return int(lib.fastmath_num_threads()) if lib is not None else 1


def _prep(mat, vec=None):
    mat = np.ascontiguousarray(mat)
    if mat.dtype not in (np.float32, np.float64):
        mat = mat.astype(np.float64)
    suffix = "f32" if mat.dtype == np.float32 else "f64"
    if vec is not None:
        vec = np.ascontiguousarray(vec, dtype=mat.dtype)
    return mat, vec, suffix


def _sym_dim(nn: int) -> int:
    import math

    n = int((math.isqrt(8 * nn + 1) - 1) // 2)
    if n * (n + 1) // 2 != nn:
        raise ValueError(f"{nn} is not a triangular number")
    return n


def sym_matvec_np(mat: np.ndarray, vec: np.ndarray) -> np.ndarray:
    """Batched compact-sym matvec on numpy arrays: ``(..., NN), (..., N)
    -> (..., N)`` via the native kernels."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    mat, vec, suffix = _prep(mat, vec)
    n = vec.shape[-1]
    batch = int(np.prod(mat.shape[:-1], dtype=np.int64))
    out = np.empty_like(vec)
    getattr(lib, f"sym_matvec_{suffix}")(
        mat.reshape(batch, -1), vec.reshape(batch, n), out.reshape(batch, n),
        batch, n)
    return out


def _sym_accmatvec_np(acc, mat, vec, name):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    mat, vec, suffix = _prep(mat, vec)
    acc = np.ascontiguousarray(acc, dtype=mat.dtype)
    n = vec.shape[-1]
    batch = int(np.prod(mat.shape[:-1], dtype=np.int64))
    out = np.empty_like(vec)
    getattr(lib, f"{name}_{suffix}")(
        acc.reshape(batch, n), mat.reshape(batch, -1),
        vec.reshape(batch, n), out.reshape(batch, n), batch, n)
    return out


def sym_addmatvec_np(acc: np.ndarray, mat: np.ndarray,
                     vec: np.ndarray) -> np.ndarray:
    """Fused ``acc + A @ v`` on numpy arrays (jitfields
    ``sym_addmatvec``, reference ``sym.py:28-35``)."""
    return _sym_accmatvec_np(acc, mat, vec, "sym_addmatvec")


def sym_submatvec_np(acc: np.ndarray, mat: np.ndarray,
                     vec: np.ndarray) -> np.ndarray:
    """Fused ``acc - A @ v`` on numpy arrays (jitfields
    ``sym_submatvec``)."""
    return _sym_accmatvec_np(acc, mat, vec, "sym_submatvec")


def sym_solve_np(mat: np.ndarray, vec: np.ndarray) -> np.ndarray:
    """Batched compact-sym solve on numpy arrays (closed form n <= 4,
    LDL^T beyond, n <= 64)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    mat, vec, suffix = _prep(mat, vec)
    n = vec.shape[-1]
    if n > 64:
        raise ValueError("native sym_solve supports n <= 64")
    batch = int(np.prod(mat.shape[:-1], dtype=np.int64))
    out = np.empty_like(vec)
    getattr(lib, f"sym_solve_{suffix}")(
        mat.reshape(batch, -1), vec.reshape(batch, n), out.reshape(batch, n),
        batch, n)
    return out


def sym_invert_np(mat: np.ndarray) -> np.ndarray:
    """Batched compact-sym inverse on numpy arrays (closed form
    n <= 4, LDL^T against identity columns beyond, n <= 64)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    mat, _, suffix = _prep(mat)
    n = _sym_dim(mat.shape[-1])
    if n > 64:
        raise ValueError("native sym_invert supports n <= 64")
    batch = int(np.prod(mat.shape[:-1], dtype=np.int64))
    out = np.empty_like(mat)
    getattr(lib, f"sym_invert_{suffix}")(
        mat.reshape(batch, -1), out.reshape(batch, -1), batch, n)
    return out
