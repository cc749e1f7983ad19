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
    "sym_matvec_chain_np",
    "sym_solve_chain_np",
    "sym_maxeig_np",
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
        getattr(lib, f"sym_matvec_chain_{suffix}").argtypes = [p, p, p, p,
                                                               i64, i32, i32]
        getattr(lib, f"sym_solve_chain_{suffix}").argtypes = [p, p, p, p,
                                                              i64, i32, i32]
        getattr(lib, f"sym_maxeig_{suffix}").argtypes = [p, p, p, p, i64,
                                                         i32, i32]
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
    # broadcast like _chain_np broadcasts `add`: the extra-vector
    # argument follows the same convention across the module
    acc = np.ascontiguousarray(
        np.broadcast_to(np.asarray(acc, dtype=mat.dtype), vec.shape))
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


def _chain_np(mat, vec, add, iters, name):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    mat, vec, suffix = _prep(mat, vec)
    n = vec.shape[-1]
    if n > 64:
        raise ValueError(f"native {name} supports n <= 64")
    if iters < 0:
        raise ValueError("iters must be >= 0")
    add = (np.zeros_like(vec) if add is None
           else np.ascontiguousarray(np.broadcast_to(add, vec.shape),
                                     dtype=mat.dtype))
    batch = int(np.prod(mat.shape[:-1], dtype=np.int64))
    out = np.empty_like(vec)
    getattr(lib, f"{name}_{suffix}")(
        mat.reshape(batch, -1), vec.reshape(batch, n),
        add.reshape(batch, n), out.reshape(batch, n), batch, n, int(iters))
    return out


def sym_matvec_chain_np(mat: np.ndarray, vec: np.ndarray, iters: int = 1,
                        add=None) -> np.ndarray:
    """Fused iterated matvec ``x <- A x + add`` on numpy arrays — the
    CPU analog of the Pallas ``sym_matvec_chain`` kernel (matrix loaded
    once per element, iterations in registers/L1)."""
    return _chain_np(mat, vec, add, iters, "sym_matvec_chain")


def sym_solve_chain_np(mat: np.ndarray, vec: np.ndarray, iters: int = 1,
                       add=None) -> np.ndarray:
    """Fused iterated solve ``x <- A \\ x + add`` on numpy arrays
    (adjugate precomputed once for n <= 4, LDL^T factored once beyond —
    factor once, substitute many)."""
    return _chain_np(mat, vec, add, iters, "sym_solve_chain")


def sym_maxeig_np(mat: np.ndarray, iters: int = 32, v0=None,
                  return_vector: bool = False):
    """Batched power iteration on numpy arrays — the CPU analog of the
    Pallas ``sym_maxeig`` kernel. Returns the Rayleigh-quotient
    dominant-eigenvalue estimate (and the unit eigenvector when
    ``return_vector``)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    mat, _, suffix = _prep(mat)
    n = _sym_dim(mat.shape[-1])
    if n > 64:
        raise ValueError("native sym_maxeig supports n <= 64")
    if iters < 0:
        raise ValueError("iters must be >= 0")
    batch_shape = mat.shape[:-1]
    if v0 is None:
        rs = np.random.RandomState(0)
        v0 = rs.standard_normal(n).astype(mat.dtype)
    v0 = np.ascontiguousarray(
        np.broadcast_to(v0, batch_shape + (n,)), dtype=mat.dtype)
    batch = int(np.prod(batch_shape, dtype=np.int64))
    mu = np.empty(batch_shape, dtype=mat.dtype)
    v = np.empty_like(v0)
    getattr(lib, f"sym_maxeig_{suffix}")(
        mat.reshape(batch, -1), v0.reshape(batch, n), mu.reshape(batch),
        v.reshape(batch, n), batch, n, int(iters))
    return (mu, v) if return_vector else mu
