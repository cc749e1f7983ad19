"""Batched small-matrix linear algebra (det / inv / matvec / lmdiv /
cholesky / logdet) for huge batches of tiny (<= 16 x 16) full matrices.

Capability parity with the reference's ``batched`` module
(``nitorch_fastmath/batched.py`` + ``_impl/batched.py``: ``batchdet``,
``batchinv``, ``batchmatvec`` with TorchScript closed forms for <= 3x3,
CUDA-only fast path) — extended with the regularized-least-squares suite
the north star asks for (``BASELINE.json`` configs[2]): ``batchlmdiv``,
``batchrmdiv``, ``batchchol``, ``batchlogdet``.

TPU-first design:

* Closed forms are generated at **trace time** from index math (shared
  Laplace-expansion machinery with :mod:`fastmath_tpu.ops.sym`) and fuse
  into a single XLA kernel over the batch; there is no device-conditional
  dispatch (the reference's fast path is CUDA-only,
  ``_impl/batched.py:53,119,175`` — here the fast path is always on).
* The reference's silent determinant regularizer (``det += range(|A|) *
  1e-12``, ``_impl/batched.py:74-77,93-96``) is preserved as an explicit
  ``regularize=`` option, **off by default** (SURVEY.md appendix).
* Sizes above the closed-form threshold use XLA's batched LAPACK-style
  primitives (``jnp.linalg``), which on TPU lower to blocked kernels.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .sym import _det_expand  # shared trace-time Laplace expansion

__all__ = [
    "batchdet",
    "batchinv",
    "batchmatvec",
    "batchmatmul",
    "batchlmdiv",
    "batchrmdiv",
    "batchchol",
    "batchlogdet",
]

_CLOSED_FORM_MAX = 4
_CHOL_UNROLL_MAX = 8
_MATMUL_UNROLL_MAX = 6


def _full_entries(a: jnp.ndarray, n: int):
    """n x n grid of lazy last-axes slices of a full (..., n, n) batch."""
    return [[a[..., i, j] for j in range(n)] for i in range(n)]


def _range_regularizer(a: jnp.ndarray):
    """The reference's dynamic-range regularizer: ``(max|A| - min|A|) *
    1e-12`` per matrix (``_impl/batched.py:74-77``)."""
    aabs = jnp.abs(a)
    rnge = jnp.max(aabs, axis=(-2, -1)) - jnp.min(aabs, axis=(-2, -1))
    return rnge * 1e-12


def batchdet(a: jnp.ndarray) -> jnp.ndarray:
    """Batched determinant ``(..., n, n) -> (...)``.

    Closed form (one fused kernel) for n <= 4; ``jnp.linalg.det``
    beyond. Reference analog: ``_impl/batched.py:21-64``.
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    if a.shape[-2] != n:
        raise ValueError("batchdet expects square matrices")
    if n > _CLOSED_FORM_MAX:
        return jnp.linalg.det(a)
    E = _full_entries(a, n)
    idx = tuple(range(n))
    return _det_expand(E, idx, idx, {})


def batchinv(a: jnp.ndarray, regularize: bool = False) -> jnp.ndarray:
    """Batched inverse ``(..., n, n) -> (..., n, n)``.

    Closed form (adjugate / det) for n <= 4; ``jnp.linalg.inv`` beyond.
    ``regularize=True`` enables the reference's range-scaled ``1e-12``
    determinant smoothing (``_impl/batched.py:74-77,93-96``); default off.
    Reference analog: ``_impl/batched.py:67-151``.
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    if a.shape[-2] != n:
        raise ValueError("batchinv expects square matrices")
    if n > _CLOSED_FORM_MAX:
        return jnp.linalg.inv(a)
    E = _full_entries(a, n)
    idx = tuple(range(n))
    cache = {}
    det = _det_expand(E, idx, idx, cache)
    if regularize:
        det = det + _range_regularizer(a)
    inv_det = 1.0 / det
    rows = []
    for i in range(n):
        row = []
        for j in range(n):
            # inv[i][j] = cofactor(j, i) / det
            rr = tuple(r for r in idx if r != j)
            cc = tuple(c for c in idx if c != i)
            minor = _det_expand(E, rr, cc, cache)
            cof = -minor if (i + j) % 2 else minor
            row.append(cof * inv_det)
        rows.append(jnp.stack(row, axis=-1))
    return jnp.stack(rows, axis=-2)


def batchmatvec(mat: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Batched matrix-vector product ``(..., m, n) @ (..., n) -> (..., m)``.

    Unrolled elementwise form for n <= 4 square (fuses with producers);
    einsum (MXU) beyond — the reference falls back to ``sugar.matvec``
    the same way (``_impl/batched.py:154-186``). Handles non-square.
    """
    mat = jnp.asarray(mat)
    vec = jnp.asarray(vec)
    m, n = mat.shape[-2:]
    if vec.shape[-1] != n:
        raise ValueError(f"matvec shape mismatch: {mat.shape} @ {vec.shape}")
    if m <= _CLOSED_FORM_MAX and n <= _CLOSED_FORM_MAX:
        rows = []
        for i in range(m):
            acc = mat[..., i, 0] * vec[..., 0]
            for j in range(1, n):
                acc = acc + mat[..., i, j] * vec[..., j]
            rows.append(acc)
        return jnp.stack(rows, axis=-1)
    return jnp.einsum("...ij,...j->...i", mat, vec, precision="highest")


def batchmatmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched matmul ``(..., m, k) @ (..., k, n) -> (..., m, n)``,
    trace-time unrolled into fused elementwise ops when every dim is
    <= 6.

    The reference *removed* its ``batchmatmul`` as "not reliably faster"
    on GPU (``batched.py:10-12``); on TPU the unrolled form is ~10x
    faster than ``dot_general`` for tiny matrices (a 4x4 per-item
    matmul occupies a 128x128 MXU tile almost entirely with padding,
    while the unrolled form is pure lane-parallel VPU work — measured
    2.4e6 -> 2.6e7 expm/s, ``BENCH_MEASURED.md``), so this build
    resurrects it and routes ``lie.expm``/``logm`` through it.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    m, k = a.shape[-2:]
    k2, n = b.shape[-2:]
    if k != k2:
        raise ValueError(f"matmul shape mismatch: {a.shape} @ {b.shape}")
    if max(m, k, n) > _MATMUL_UNROLL_MAX:
        return jnp.matmul(a, b, precision="highest")
    rows = []
    for i in range(m):
        row = []
        for j in range(n):
            acc = a[..., i, 0] * b[..., 0, j]
            for kk in range(1, k):
                acc = acc + a[..., i, kk] * b[..., kk, j]
            row.append(acc)
        rows.append(jnp.stack(row, axis=-1))
    return jnp.stack(rows, axis=-2)


def batchlmdiv(
    a: jnp.ndarray, b: jnp.ndarray, regularize: bool = False
) -> jnp.ndarray:
    r"""Batched left division ``A \ b`` for small full matrices.

    ``b`` may be a vector ``(..., n)`` or a matrix ``(..., n, k)``.
    Closed-form adjugate solve for n <= 4, ``jnp.linalg.solve`` beyond.
    (North-star extension; the reference routes this through
    ``sugar.lmdiv``.)
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    n = a.shape[-1]
    vector_rhs = b.ndim == a.ndim - 1
    if n <= _CLOSED_FORM_MAX:
        inv = batchinv(a, regularize=regularize)
        if vector_rhs:
            return batchmatvec(inv, b)
        return jnp.matmul(inv, b, precision="highest")
    if vector_rhs:
        return jnp.linalg.solve(a, b[..., None])[..., 0]
    return jnp.linalg.solve(a, b)


def batchrmdiv(
    a: jnp.ndarray, b: jnp.ndarray, regularize: bool = False
) -> jnp.ndarray:
    """Batched right division ``a @ inv(b)`` (transpose of lmdiv)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    bt = jnp.swapaxes(b, -1, -2)
    at = jnp.swapaxes(a, -1, -2)
    return jnp.swapaxes(batchlmdiv(bt, at, regularize=regularize), -1, -2)


def batchchol(a: jnp.ndarray) -> jnp.ndarray:
    """Batched lower Cholesky factor of SPD matrices ``(..., n, n)``.

    Fully unrolled Cholesky-Banachiewicz for n <= 8 (one fused
    elementwise kernel, no per-element control flow); XLA's blocked
    ``jnp.linalg.cholesky`` beyond. (North-star extension,
    ``BASELINE.json`` configs[2].)
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    if n > _CHOL_UNROLL_MAX:
        return jnp.linalg.cholesky(a)
    E = _full_entries(a, n)
    L = [[None] * n for _ in range(n)]
    zero = jnp.zeros_like(E[0][0])
    for j in range(n):
        s = E[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv_ljj = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = E[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_ljj
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def batchlogdet(a: jnp.ndarray) -> jnp.ndarray:
    """Batched ``log |det A|`` ``(..., n, n) -> (...)``.

    Closed form via the n <= 4 determinant; ``jnp.linalg.slogdet``
    beyond. (North-star extension, ``BASELINE.json`` configs[2].)
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    if n <= _CLOSED_FORM_MAX:
        return jnp.log(jnp.abs(batchdet(a)))
    return jnp.linalg.slogdet(a)[1]
