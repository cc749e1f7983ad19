"""Batched linear-algebra sugar (lmdiv/rmdiv/inv/matvec/outer/dot/...).

Capability parity with the reference's ``sugar`` module
(``nitorch_fastmath/sugar.py``): thin, broadcast-friendly wrappers over
batched linalg primitives. TPU notes: everything lowers to XLA batched
LU/Cholesky/SVD; ``matvec``/``outer``/``dot`` are einsums that XLA maps
to the MXU for large inner dims and fuses into neighbors for small ones.

Complex conventions preserved from the reference: ``dot``/``mdot``/
``outer`` are conjugate-(anti)linear in the **first** argument
(``sugar.py:402-418, 344-351``), unlike ``torch.dot``/``jnp.dot``.
"""
from __future__ import annotations

from typing import Literal, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

__all__ = [
    "kron2",
    "lmdiv",
    "rmdiv",
    "inv",
    "matvec",
    "solvevec",
    "outer",
    "trace",
    "dot",
    "mdot",
    "is_orthonormal",
    "round",
]

# module-level aliases, as in the reference (``sugar.py:38-40``; not in
# __all__ there either)
solve = jnp.linalg.solve
pinv = jnp.linalg.pinv
cholesky = jnp.linalg.cholesky

Method = Literal["lu", "chol", "svd", "pinv"]


def kron2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Kronecker product of the two last dims:
    ``(..., m, n) x (..., p, q) -> (..., m*p, n*q)``.

    Reference analog: ``sugar.py:43-73``.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    m, n = a.shape[-2:]
    p, q = b.shape[-2:]
    out = a[..., :, None, :, None] * b[..., None, :, None, :]
    return out.reshape(*out.shape[:-4], m * p, n * q)


def _chol_solve(a, b):
    from jax.scipy.linalg import solve_triangular

    if a.shape[-1] <= 16 and not jnp.issubdtype(
        jnp.result_type(a, b), jnp.complexfloating
    ):
        # unrolled cholesky + substitutions: fuses, ~20x XLA's blocked
        # path for small n on TPU (see ops/batched.py; unroll gate 16
        # matches batchchol)
        from .batched import _chol_solve_unrolled

        return _chol_solve_unrolled(a, jnp.asarray(b))
    l = jnp.linalg.cholesky(a)
    y = solve_triangular(l, b, lower=True)
    return solve_triangular(jnp.conjugate(jnp.swapaxes(l, -1, -2)), y, lower=False)


def lmdiv(
    a: jnp.ndarray,
    b: jnp.ndarray,
    method: Method = "lu",
    rcond: float = 1e-15,
    out=None,
) -> jnp.ndarray:
    r"""Left matrix division ``A \ B`` for batched matrices.

    ``a``: ``(..., m, n)``, ``b``: ``(..., m, k)`` -> ``(..., n, k)``.
    Non-square ``a`` always uses the pseudoinverse (reference
    ``sugar.py:123-124``). Methods: ``lu`` (default), ``chol`` (A SPD),
    ``svd``, ``pinv`` (thresholded SVD with ``rcond``).
    Reference analog: ``sugar.py:75-138``.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.shape[-1] != a.shape[-2]:
        method = "pinv"
    method = method.lower()
    if method.startswith("lu"):
        if a.shape[-1] <= 16:
            # unrolled/rolled PLU tier (+ Pallas routing at 5 <= n <= 8)
            from .batched import batchlmdiv

            return batchlmdiv(a, b)
        return jnp.linalg.solve(a, b)
    if method.startswith("chol"):
        return _chol_solve(a, b)
    if method.startswith("svd"):
        u, s, vh = jnp.linalg.svd(a, full_matrices=False)
        # precision="highest": TPU's default f32 matmul is bf16-class
        uhb = jnp.matmul(jnp.conjugate(jnp.swapaxes(u, -1, -2)), b,
                         precision="highest")
        return jnp.matmul(jnp.conjugate(jnp.swapaxes(vh, -1, -2)),
                          uhb / s[..., None], precision="highest")
    if method.startswith("pinv"):
        return jnp.matmul(jnp.linalg.pinv(a, rtol=rcond), b,
                          precision="highest")
    raise ValueError(f"Unknown inversion method {method}.")


def rmdiv(
    a: jnp.ndarray,
    b: jnp.ndarray,
    method: Method = "lu",
    rcond: float = 1e-15,
    out=None,
) -> jnp.ndarray:
    r"""Right matrix division ``A / B`` (i.e. ``A @ inv(B)``).

    ``a``: ``(..., k, m)``, ``b``: ``(..., n, m)`` -> ``(..., k, n)``.
    Implemented by transposing into a left division (reference
    ``sugar.py:140-192``).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    at = jnp.conjugate(jnp.swapaxes(a, -1, -2))
    bt = jnp.conjugate(jnp.swapaxes(b, -1, -2))
    xt = lmdiv(bt, at, method=method, rcond=rcond)
    return jnp.conjugate(jnp.swapaxes(xt, -1, -2))


def inv(
    a: jnp.ndarray,
    method: Method = "lu",
    rcond: float = 1e-15,
    out=None,
) -> jnp.ndarray:
    """Batched matrix inverse (pseudoinverse when non-square).

    Reference analog: ``sugar.py:194-259``.
    """
    a = jnp.asarray(a)
    if a.shape[-1] != a.shape[-2]:
        method = "pinv"
    method = method.lower()
    if method.startswith("lu"):
        if a.shape[-1] <= 16:
            # unrolled/rolled PLU tier (+ Pallas routing at 5 <= n <= 8)
            from .batched import batchinv

            return batchinv(a)
        return jnp.linalg.inv(a)
    if method.startswith("chol"):
        eye = jnp.eye(a.shape[-1], dtype=a.dtype)
        return _chol_solve(a, jnp.broadcast_to(eye, a.shape))
    if method.startswith("svd"):
        u, s, vh = jnp.linalg.svd(a, full_matrices=False)
        return jnp.matmul(
            jnp.conjugate(jnp.swapaxes(vh, -1, -2)),
            jnp.conjugate(jnp.swapaxes(u, -1, -2)) / s[..., None],
            precision="highest")
    if method.startswith("pinv"):
        return jnp.linalg.pinv(a, rtol=rcond)
    raise ValueError(f"Unknown inversion method {method}.")


def matvec(
    mat: jnp.ndarray, vec: jnp.ndarray, out=None
) -> jnp.ndarray:
    """Batched matrix-vector product ``(..., m, n) @ (..., n) -> (..., m)``.

    Reference analog: ``sugar.py:261-288``.
    """
    mat = jnp.asarray(mat)
    vec = jnp.asarray(vec)
    return jnp.matmul(mat, vec[..., None], precision="highest")[..., 0]


def solvevec(
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    method: Method = "lu",
    rcond: float = 1e-15,
    out=None,
) -> jnp.ndarray:
    r"""Solve ``A x = v`` for a batched vector right-hand side.

    Reference analog: ``sugar.py:290-342``.
    """
    vec = jnp.asarray(vec)
    return lmdiv(mat, vec[..., None], method=method, rcond=rcond)[..., 0]


def outer(a: jnp.ndarray, b: jnp.ndarray, out=None) -> jnp.ndarray:
    """Batched outer product ``a b^H``: ``(..., n) x (..., m) -> (..., n, m)``.

    Conjugates the second operand for complex inputs (reference
    ``sugar.py:344-375``).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return a[..., :, None] * jnp.conjugate(b)[..., None, :]


def trace(a: jnp.ndarray, keepdim: bool = False) -> jnp.ndarray:
    """Batched trace ``(..., m, m) -> (..., [1, 1])``.

    Reference analog: ``sugar.py:378-399``.
    """
    a = jnp.asarray(a)
    t = jnp.trace(a, axis1=-2, axis2=-1)
    if keepdim:
        t = t[..., None, None]
    return t


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdim: bool = False, out=None):
    r"""Batched dot product ``a^H b`` over the last axis.

    Antilinear in the **first** argument for complex inputs — this
    differs from ``jnp.vecdot``'s default and from ``torch.dot``
    (reference warning at ``sugar.py:410-418``).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    res = jnp.sum(jnp.conjugate(a) * b, axis=-1)
    if keepdim:
        res = res[..., None]
    return res


def mdot(a: jnp.ndarray, b: jnp.ndarray, keepdim: bool = False, out=None):
    r"""Frobenius inner product ``tr(A^H B)`` over the two last axes.

    Antilinear in the first argument (reference ``sugar.py:456-501``).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    res = jnp.sum(jnp.conjugate(a) * b, axis=(-2, -1))
    if keepdim:
        res = res[..., None, None]
    return res


def is_orthonormal(
    basis: jnp.ndarray, return_matrix: bool = False
) -> Union[bool, Tuple[bool, jnp.ndarray]]:
    """Check that a basis ``(F, N, [M])`` is orthonormal under the
    (matrix) inner product; optionally return the F x F Gram matrix.

    Reference analog: ``sugar.py:503-535``. Note: performs a host sync
    (returns a Python bool), so don't call it inside ``jit``.
    """
    basis = jnp.asarray(basis)
    f = basis.shape[0]
    flat = basis.reshape(f, -1)
    gram = jnp.matmul(jnp.conjugate(flat), flat.T,
                      precision="highest")
    check = bool(
        jnp.allclose(gram, jnp.eye(f, dtype=gram.dtype), rtol=1e-5, atol=1e-8)
    )
    return (check, gram) if return_matrix else check


def round(t: jnp.ndarray, decimals: int = 0) -> jnp.ndarray:
    """Round to ``decimals`` decimal places (reference ``sugar.py:538-553``)."""
    t = jnp.asarray(t)
    scale = 10**decimals
    return jnp.round(t * scale) / scale
