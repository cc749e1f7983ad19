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

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import downcast as _downcast, upcast_half
from ._routing import use_pallas as _use_pallas
from .sym import _det_expand  # shared trace-time Laplace expansion

#: largest n served by the Pallas full-matrix tier
#: (kernels/batched_pallas.py: unrolled register PLU to 8, rolled
#: stacked-grid PLU 9..32 — n <= 16 is the BASELINE gate, 17..32
#: removes the cap the reference's jitfields kernels never had)
_PALLAS_MAX_N = 32


def _route_full(backend, n, dtype, batch, auto=True, n_max=_PALLAS_MAX_N,
                what="square real-float batches"):
    """Routing decision for the full-storage batched ops (mirrors
    ``ops/sym.py:_route_compact``). ``n_max`` is the calling op's
    kernel cap (32 for both the PLU and Cholesky families) so a forced
    ``backend="pallas"`` raises from the routing layer with the right
    bound instead of deep inside the kernel wrapper."""
    supported = (
        n <= n_max
        and jnp.issubdtype(jnp.dtype(dtype), jnp.floating)
    )
    if backend == "auto" and not auto:
        return False
    return _use_pallas(
        backend,
        supported=supported,
        batch=batch,
        dtype=dtype,
        small_n=n <= _CLOSED_FORM_MAX,
        why_unsupported=(
            f"pallas tier serves {what} with "
            f"n <= {n_max} (got n={n}, {jnp.dtype(dtype).name})"
        ),
    )


def _to_channels(a, n):
    """Lazy channel-first view ``(..., n, n) -> (n*n, ...)`` (row-major
    channels; composes with the kernels' block-major repack)."""
    return jnp.moveaxis(a.reshape(*a.shape[:-2], n * n), -1, 0)


def _nb(a):
    """Static batch size of a ``(..., n, n)`` operand."""
    return int(np.prod(a.shape[:-2], dtype=np.int64))

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
#: Largest n for the fully unrolled Cholesky (n^3/6 fused FMAs —
#: small enough to unroll through 16, the BASELINE gate size; the
#: blocked XLA path at 16x16 is ~10x slower on TPU).
_CHOL_UNROLL_MAX = 16
_MATMUL_UNROLL_MAX = 6

#: Largest n routed through the fast pivoted-LU tier (the BASELINE
#: <=16x16 gate). n <= _PLU_UNROLL_N uses the fully trace-time-unrolled
#: factorization; above it a ``fori_loop``-rolled variant runs the same
#: one-hot masked elimination with O(1) compile time (the unrolled form
#: at n=16 took minutes to compile; the rolled one compiles in seconds
#: and keeps ~the same runtime — the per-step work is identical
#: elementwise algebra, just not shape-specialized per k).
LU_UNROLL_MAX = 16
_PLU_UNROLL_N = 8


def _plu_unrolled(a: jnp.ndarray):
    """Trace-time unrolled batched LU with partial pivoting.

    Returns ``(lu, perm, parity)``: ``lu`` packs unit-lower L below the
    diagonal and U on/above it, ``perm (..., n)`` is the row
    permutation (``P A = L U`` with ``(P A)[i] = A[perm[i]]``), and
    ``parity (...)`` is the permutation sign. All control flow is
    static; the per-step row swap is the elementwise identity
    ``A += (e_k - o_p) (x) (row_p - row_k)`` with one-hot ``o_p`` of the
    dynamic pivot index — no scatters, so the whole factorization fuses
    into lane-parallel VPU work (XLA's blocked LU is ~50x slower for
    tiny n, BENCH_MEASURED.md).
    """
    n = a.shape[-1]
    batch = a.shape[:-2]
    perm = jnp.broadcast_to(jnp.arange(n), (*batch, n)).astype(jnp.int32)
    parity = jnp.ones(batch, dtype=a.dtype)
    rows_idx = jnp.arange(n)
    for k in range(n):
        # pivot: argmax |a[k:, k]| (masked below row k)
        col = jnp.abs(a[..., :, k])
        col = jnp.where(rows_idx >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)  # (...,)
        op = (rows_idx == p[..., None]).astype(a.dtype)  # (..., n)
        ek = (rows_idx == k).astype(a.dtype)
        row_p = jnp.sum(a * op[..., :, None], axis=-2)
        row_k = a[..., k, :]
        a = a + (ek - op)[..., :, None] * (row_p - row_k)[..., None, :]
        permp = jnp.sum(perm * op.astype(perm.dtype), axis=-1)
        permk = perm[..., k]
        perm = perm + ((ek - op) * (permp - permk)[..., None]).astype(perm.dtype)
        parity = parity * jnp.where(p == k, 1.0, -1.0).astype(a.dtype)
        if k < n - 1:
            inv_piv = 1.0 / a[..., k, k]
            l = a[..., k + 1 :, k] * inv_piv[..., None]
            a = a.at[..., k + 1 :, k:].add(
                -l[..., :, None] * a[..., k : k + 1, k:]
            )
            a = a.at[..., k + 1 :, k].set(l)
    return a, perm, parity


def _plu_rolled(a: jnp.ndarray):
    """``fori_loop``-rolled batched LU with partial pivoting — the same
    scatter-free one-hot elimination as :func:`_plu_unrolled`, with the
    step index ``k`` traced instead of unrolled (O(1) compile time; used
    for 9 <= n <= 32 where full unrolling takes minutes to compile).

    Returns the same ``(lu, perm, parity)`` packing.
    """
    n = a.shape[-1]
    batch = a.shape[:-2]
    rows_idx = jnp.arange(n)
    perm0 = jnp.broadcast_to(rows_idx, (*batch, n)).astype(jnp.int32)
    parity0 = jnp.ones(batch, dtype=a.dtype)

    def body(k, carry):
        a, perm, parity = carry
        ek = (rows_idx == k).astype(a.dtype)  # (n,)
        below = (rows_idx > k).astype(a.dtype)
        # column k / pivot search over rows >= k
        col = jnp.abs(jnp.sum(a * ek[None, :], axis=-1))  # |a[:, k]|
        col = jnp.where(rows_idx >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)
        op = (rows_idx == p[..., None]).astype(a.dtype)  # (..., n)
        row_p = jnp.sum(a * op[..., :, None], axis=-2)
        row_k = jnp.sum(a * ek[..., :, None], axis=-2)
        a = a + (ek - op)[..., :, None] * (row_p - row_k)[..., None, :]
        permp = jnp.sum(perm * op.astype(perm.dtype), axis=-1)
        permk = jnp.sum(perm * ek.astype(perm.dtype), axis=-1)
        perm = perm + ((ek - op) * (permp - permk)[..., None]).astype(
            perm.dtype
        )
        parity = parity * jnp.where(p == k, 1.0, -1.0).astype(a.dtype)
        # elimination of rows > k (masked; trailing columns only)
        akk = jnp.sum(row_p * ek, axis=-1)  # pivot value (row_p is new row k)
        lcol = jnp.sum(a * ek[None, :], axis=-1) / akk[..., None]
        lcol = lcol * below  # zero outside rows > k
        tail = (rows_idx >= k).astype(a.dtype)  # columns k..n-1
        a = a - lcol[..., :, None] * (row_p * tail)[..., None, :]
        # store multipliers in column k of rows > k (the subtraction
        # left ~0 there; replace exactly)
        colmask = (below[:, None] * ek[None, :])
        a = a * (1.0 - colmask) + lcol[..., :, None] * ek[None, :]
        return a, perm, parity

    return jax.lax.fori_loop(0, n, body, (a, perm0, parity0))


def _plu(a: jnp.ndarray):
    """Dispatch: fully unrolled for n <= _PLU_UNROLL_N, rolled beyond."""
    if a.shape[-1] <= _PLU_UNROLL_N:
        return _plu_unrolled(a)
    return _plu_rolled(a)


def _lu_solve_unrolled(lu, perm, b):
    """Solve ``A x = b`` given the packed unrolled PLU. ``b`` is
    ``(..., n)`` or ``(..., n, m)``; substitutions are fully unrolled."""
    vector = b.ndim == lu.ndim - 1
    if vector:
        b = b[..., None]
    n = lu.shape[-1]
    # apply P: (Pb)[i] = b[perm[i]]
    y = jnp.take_along_axis(b, perm[..., :, None].astype(jnp.int32),
                            axis=-2)
    # forward substitution with unit-lower L
    ys = [y[..., i, :] for i in range(n)]
    for i in range(n):
        for j in range(i):
            ys[i] = ys[i] - lu[..., i, j][..., None] * ys[j]
    # back substitution with U
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, n):
            ys[i] = ys[i] - lu[..., i, j][..., None] * ys[j]
        ys[i] = ys[i] / lu[..., i, i][..., None]
    x = jnp.stack(ys, axis=-2)
    return x[..., 0] if vector else x


def _full_entries(a: jnp.ndarray, n: int):
    """n x n grid of lazy last-axes slices of a full (..., n, n) batch."""
    return [[a[..., i, j] for j in range(n)] for i in range(n)]


def _range_regularizer(a: jnp.ndarray):
    """The reference's dynamic-range regularizer: ``(max|A| - min|A|) *
    1e-12`` per matrix (``_impl/batched.py:74-77``)."""
    aabs = jnp.abs(a)
    rnge = jnp.max(aabs, axis=(-2, -1)) - jnp.min(aabs, axis=(-2, -1))
    return rnge * 1e-12


def batchdet(a: jnp.ndarray, backend: str = "auto") -> jnp.ndarray:
    """Batched determinant ``(..., n, n) -> (...)``.

    XLA tier: closed form (one fused kernel) for n <= 4, unrolled
    pivoted LU for n <= 8, fori_loop-rolled PLU for n <= 16
    (``LU_UNROLL_MAX``), ``jnp.linalg.det`` beyond. ``backend="auto"``
    dispatches to the Pallas in-register tier on TPU where it wins
    (5 <= n <= 32; n <= 4 at >= 8M batches — see ``ops/_routing.py``). Reference analog:
    ``_impl/batched.py:21-64``.
    The routed Pallas path carries a custom VJP (reverse-mode
    only); forward-mode AD (``jax.jvp`` / ``jacfwd``) needs
    ``backend="xla"``.
    """
    a, half = upcast_half(a)
    n = a.shape[-1]
    if a.shape[-2] != n:
        raise ValueError("batchdet expects square matrices")
    if _route_full(backend, n, a.dtype, _nb(a)):
        from ..kernels.batched_pallas import det_cf

        return _downcast(det_cf(_to_channels(a, n), bm=True), half)
    if n > LU_UNROLL_MAX:
        return _downcast(jnp.linalg.det(a), half)
    if n > _CLOSED_FORM_MAX:
        lu, _, parity = _plu(a)
        det = lu[..., 0, 0]
        for i in range(1, n):
            det = det * lu[..., i, i]
        return _downcast(det * parity, half)
    E = _full_entries(a, n)
    idx = tuple(range(n))
    return _downcast(_det_expand(E, idx, idx, {}), half)


def batchinv(
    a: jnp.ndarray, regularize: bool = False, backend: str = "auto"
) -> jnp.ndarray:
    """Batched inverse ``(..., n, n) -> (..., n, n)``.

    XLA tier: closed form (adjugate / det) for n <= 4, unrolled
    pivoted LU for n <= 8 (~50x XLA's blocked path on TPU),
    fori_loop-rolled PLU for n <= 16 (``LU_UNROLL_MAX``),
    ``jnp.linalg.inv`` beyond. ``backend="auto"`` dispatches to the
    Pallas in-register PLU on TPU where it wins (5 <= n <= 32; see
    :func:`batchdet`; ``regularize=True`` pins the XLA path — the
    kernel has no determinant-smoothing knob).
    ``regularize=True`` (closed-form path only) enables the reference's range-scaled ``1e-12``
    determinant smoothing (``_impl/batched.py:74-77,93-96``); default off.
    Reference analog: ``_impl/batched.py:67-151``.
    The routed Pallas path carries a custom VJP (reverse-mode
    only); forward-mode AD (``jax.jvp`` / ``jacfwd``) needs
    ``backend="xla"``.
    """
    a, half = upcast_half(a)
    n = a.shape[-1]
    if a.shape[-2] != n:
        raise ValueError("batchinv expects square matrices")
    if regularize and backend == "pallas":
        raise ValueError(
            "backend='pallas' does not implement regularize=True "
            "(the reference's det smoothing is a closed-form-path knob)"
        )
    if not regularize and _route_full(backend, n, a.dtype, _nb(a)):
        from ..kernels.batched_pallas import inv_cf

        out = inv_cf(_to_channels(a, n), bm=True)
        out = jnp.moveaxis(out, 0, -1).reshape(*a.shape[:-2], n, n)
        return _downcast(out, half)
    if n > LU_UNROLL_MAX:
        return _downcast(jnp.linalg.inv(a), half)
    if n > _CLOSED_FORM_MAX:
        lu, perm, _ = _plu(a)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
        return _downcast(_lu_solve_unrolled(lu, perm, eye), half)
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
    return _downcast(jnp.stack(rows, axis=-2), half)


def batchmatvec(mat: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Batched matrix-vector product ``(..., m, n) @ (..., n) -> (..., m)``.

    Unrolled elementwise form for n <= 4 square (fuses with producers);
    einsum (MXU) beyond — the reference falls back to ``sugar.matvec``
    the same way (``_impl/batched.py:154-186``). Handles non-square.
    """
    mat, vec, half = upcast_half(mat, vec)
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
        return _downcast(jnp.stack(rows, axis=-1), half)
    out = jnp.einsum("...ij,...j->...i", mat, vec, precision="highest")
    return _downcast(out, half)


def batchmatmul(
    a: jnp.ndarray, b: jnp.ndarray, backend: str = "auto"
) -> jnp.ndarray:
    """Batched matmul ``(..., m, k) @ (..., k, n) -> (..., m, n)``,
    trace-time unrolled into fused elementwise ops when every dim is
    <= 6, MXU ``dot_general`` (``precision="highest"``) beyond.

    The reference *removed* its ``batchmatmul`` as "not reliably faster"
    on GPU (``batched.py:10-12``); on TPU the unrolled tiny tier is a
    real ~10x win over ``dot_general`` (a 4x4 per-item product pads a
    128x128 MXU tile almost entirely with zeros while the unrolled form
    is pure lane-parallel VPU work — measured 2.4e6 -> 2.6e7 expm/s,
    ``BENCH_MEASURED.md``), so this build resurrects it and routes
    ``lie.expm``/``logm`` through it. At 7 <= dim <= 32 a rolled
    stacked-grid Pallas kernel exists (``backend="pallas"``,
    :func:`fastmath_tpu.kernels.matmul_cf`) but hardware measurement
    puts XLA's batched ``dot_general`` 1.5-4.7x ahead at every size
    8..32 (1.4e8 vs 3.7e7 mm/s at 16x16/500k — the MXU eats the tile
    padding far better than the VPU eats k rank-1 FMA passes), so
    ``auto`` never routes; the kernel remains available for fusion
    inside larger Pallas pipelines. The Pallas path carries a custom
    VJP (reverse-mode only); forward-mode AD (``jax.jvp`` /
    ``jacfwd``) needs the default path.
    """
    a, b, half = upcast_half(a, b)
    m, k = a.shape[-2:]
    k2, n = b.shape[-2:]
    if k != k2:
        raise ValueError(f"matmul shape mismatch: {a.shape} @ {b.shape}")
    dims = max(m, k, n)
    batch_shape = np.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    if _route_full(
        backend, dims, jnp.result_type(a, b),
        int(np.prod(batch_shape, dtype=np.int64)),
        # never auto-route: measured on v5e, XLA's batched dot_general
        # beats the stacked-grid kernel 1.5-4.7x across 8 <= dim <= 32
        # (BENCH_MEASURED.md batchmatmul rows) — dot_general's MXU tile
        # padding is cheaper than the kernel's k rank-1 VPU passes
        auto=False,
        what="real-float batches, every dim",
    ):
        from ..kernels.batched_pallas import matmul_cf

        ab = jnp.broadcast_to(a, (*batch_shape, m, k))
        bb = jnp.broadcast_to(b, (*batch_shape, k, n))
        acf = jnp.moveaxis(ab.reshape(*batch_shape, m * k), -1, 0)
        bcf = jnp.moveaxis(bb.reshape(*batch_shape, k * n), -1, 0)
        out = matmul_cf(acf, bcf, m, n, bm=True)
        out = jnp.moveaxis(out, 0, -1).reshape(*batch_shape, m, n)
        return _downcast(out, half)
    if dims > _MATMUL_UNROLL_MAX:
        return _downcast(jnp.matmul(a, b, precision="highest"), half)
    rows = []
    for i in range(m):
        row = []
        for j in range(n):
            acc = a[..., i, 0] * b[..., 0, j]
            for kk in range(1, k):
                acc = acc + a[..., i, kk] * b[..., kk, j]
            row.append(acc)
        rows.append(jnp.stack(row, axis=-1))
    return _downcast(jnp.stack(rows, axis=-2), half)


def batchlmdiv(
    a: jnp.ndarray, b: jnp.ndarray, regularize: bool = False,
    backend: str = "auto",
) -> jnp.ndarray:
    r"""Batched left division ``A \ b`` for small full matrices.

    ``b`` may be a vector ``(..., n)`` or a matrix ``(..., n, k)``.
    XLA tier: closed-form adjugate solve for n <= 4, pivoted-LU solve
    (unrolled n <= 8, fori_loop-rolled 9..16, ``LU_UNROLL_MAX``),
    ``jnp.linalg.solve`` beyond. ``backend="auto"`` dispatches
    5 <= n <= 32 (k <= 8 RHS columns through n = 8, k <= 16 beyond)
    to the Pallas in-register PLU solve
    (:func:`fastmath_tpu.kernels.solve_full_cf`) on TPU — the fused
    XLA PLU tier is dispatch/layout-bound ~20x below it.
    (North-star extension; the reference routes this through
    ``sugar.lmdiv``.)
    The routed Pallas path carries a custom VJP (reverse-mode
    only); forward-mode AD (``jax.jvp`` / ``jacfwd``) needs
    ``backend="xla"``.
    """
    a, b, half = upcast_half(a, b)
    n = a.shape[-1]
    vector_rhs = b.ndim == a.ndim - 1
    k = 1 if vector_rhs else b.shape[-1]
    k_cap = 16 if n > 8 else 8
    if backend == "pallas":
        # raise, don't silently fall back, when the forced backend
        # cannot serve the arguments (mirrors batchinv)
        if regularize:
            raise ValueError(
                "backend='pallas' does not implement regularize=True "
                "(the reference's det smoothing is a closed-form-path "
                "knob)")
        if k > k_cap:
            raise ValueError(
                f"backend='pallas' lmdiv caps RHS columns at {k_cap} "
                f"for n={n}; got k={k}")
    # route on the BROADCAST batch: a single shared matrix against a
    # huge RHS batch is still a huge workload
    nb_bc = int(np.prod(np.broadcast_shapes(
        a.shape[:-2], b.shape[:b.ndim - (1 if vector_rhs else 2)]),
        dtype=np.int64))
    if (not regularize and k <= k_cap
            and _route_full(backend, n, a.dtype, nb_bc, auto=n > 4)):
        from ..kernels.batched_pallas import solve_full_cf

        nb_dims = b.ndim - (1 if vector_rhs else 2)
        bshape = np.broadcast_shapes(a.shape[:-2], b.shape[:nb_dims])
        a2 = jnp.broadcast_to(a, bshape + a.shape[-2:])
        bfull = b if not vector_rhs else b[..., None]
        bfull = jnp.broadcast_to(bfull, bshape + (n, k))
        rhs = jnp.moveaxis(bfull.reshape(*bshape, n * k), -1, 0)
        out = solve_full_cf(_to_channels(a2, n), rhs, k=k, bm=True)
        out = jnp.moveaxis(out, 0, -1).reshape(*bshape, n, k)
        return _downcast(out[..., 0] if vector_rhs else out, half)
    if n <= _CLOSED_FORM_MAX:
        inv = batchinv(a, regularize=regularize)
        if vector_rhs:
            return _downcast(batchmatvec(inv, b), half)
        return _downcast(batchmatmul(inv, b), half)
    if n <= LU_UNROLL_MAX:
        nb = b.ndim - (1 if vector_rhs else 2)
        bshape = np.broadcast_shapes(a.shape[:-2], b.shape[:nb])
        lu, perm, _ = _plu(
            jnp.broadcast_to(a, bshape + a.shape[-2:])
        )
        b = jnp.broadcast_to(b, bshape + b.shape[nb:])
        return _downcast(_lu_solve_unrolled(lu, perm, b), half)
    if vector_rhs:
        return _downcast(jnp.linalg.solve(a, b[..., None])[..., 0], half)
    return _downcast(jnp.linalg.solve(a, b), half)


def batchrmdiv(
    a: jnp.ndarray, b: jnp.ndarray, regularize: bool = False,
    backend: str = "auto",
) -> jnp.ndarray:
    """Batched right division ``a @ inv(b)`` (transpose of lmdiv;
    ``backend`` as in :func:`batchlmdiv`)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    bt = jnp.swapaxes(b, -1, -2)
    at = jnp.swapaxes(a, -1, -2)
    return jnp.swapaxes(
        batchlmdiv(bt, at, regularize=regularize, backend=backend), -1, -2
    )


def batchchol(a: jnp.ndarray, backend: str = "auto") -> jnp.ndarray:
    """Batched lower Cholesky factor of SPD matrices ``(..., n, n)``.

    Fully unrolled Cholesky-Banachiewicz for n <= 16 (one fused
    elementwise kernel, no per-element control flow); XLA's blocked
    ``jnp.linalg.cholesky`` beyond. Unlike the pivoted ops, the
    unrolled Cholesky is branch-free elementwise work XLA fuses at
    full stream rate — measured 3.2e8 vs 1.1e8 chol/s routed at 8x8
    on v5e — so ``auto`` == ``xla`` through n <= 16. At 17 <= n <= 32
    XLA has no unrolled form (batched blocked cholesky is dispatch-
    bound, like batched LU) and ``auto`` routes to the rolled
    stacked-grid Pallas kernel on TPU; an explicit
    ``backend="pallas"`` reaches the kernel at any n <= 32 (compact
    in/out via a pack/unpack pass either side).
    (North-star extension, ``BASELINE.json`` configs[2].)
    The routed Pallas path carries a custom VJP (reverse-mode
    only); forward-mode AD (``jax.jvp`` / ``jacfwd``) needs
    ``backend="xla"``.
    """
    a, half = upcast_half(a)
    n = a.shape[-1]
    if _route_full(backend, n, a.dtype, _nb(a), auto=n > _CHOL_UNROLL_MAX,
                   n_max=_PALLAS_MAX_N):
        from ..kernels.batched_pallas import chol_cf
        from ..layouts.sym import full_to_sym, tri_index

        comp = jnp.moveaxis(full_to_sym(a), -1, 0)
        lc = chol_cf(comp, bm=True)  # compact slots, lower factor
        zero = jnp.zeros_like(lc[0])
        rows = [
            jnp.stack(
                [lc[tri_index(i, j, n)] if j <= i else zero
                 for j in range(n)],
                axis=-1,
            )
            for i in range(n)
        ]
        return _downcast(jnp.stack(rows, axis=-2), half)
    if n > _CHOL_UNROLL_MAX:
        return _downcast(jnp.linalg.cholesky(a), half)
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
    return _downcast(jnp.stack(rows, axis=-2), half)


def batchlogdet(a: jnp.ndarray, backend: str = "auto") -> jnp.ndarray:
    """Batched ``log |det A|`` ``(..., n, n) -> (...)``.

    XLA tier: closed form via the n <= 4 determinant, unrolled
    pivoted LU for n <= 8, fori_loop-rolled PLU for n <= 16
    (``LU_UNROLL_MAX``), ``jnp.linalg.slogdet`` beyond.
    ``backend="auto"`` dispatches to the Pallas in-register
    PLU tier on TPU where it wins (5 <= n <= 32; the log of |diag U|
    accumulates in registers). (North-star extension, ``BASELINE.json``
    configs[2].)
    The routed Pallas path carries a custom VJP (reverse-mode
    only); forward-mode AD (``jax.jvp`` / ``jacfwd``) needs
    ``backend="xla"``.
    """
    a, half = upcast_half(a)
    n = a.shape[-1]
    if _route_full(backend, n, a.dtype, _nb(a)):
        from ..kernels.batched_pallas import logdet_cf

        return _downcast(logdet_cf(_to_channels(a, n), bm=True), half)
    # core.accmath.log, not jnp.log: the output IS a log, and XLA
    # TPU's f32 log is ~4000 ulp worst-case (measured round 4)
    from ..core.accmath import log as _acclog

    if n <= _CLOSED_FORM_MAX:
        return _downcast(_acclog(jnp.abs(batchdet(a))), half)
    if n <= LU_UNROLL_MAX:
        lu, _, _ = _plu(a)
        acc = _acclog(jnp.abs(lu[..., 0, 0]))
        for i in range(1, n):
            acc = acc + _acclog(jnp.abs(lu[..., i, i]))
        return _downcast(acc, half)
    return _downcast(jnp.linalg.slogdet(a)[1], half)


def _chol_solve_unrolled(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SPD solve via the unrolled Cholesky + fully unrolled triangular
    substitutions (real dtypes, n <= 8). Used by ``sugar.lmdiv/inv``'s
    ``chol`` method on the small-matrix fast path."""
    n = a.shape[-1]
    vector = b.ndim == a.ndim - 1
    if vector:
        b = b[..., None]
    bshape = np.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a = jnp.broadcast_to(a, bshape + a.shape[-2:])
    b = jnp.broadcast_to(b, bshape + b.shape[-2:])
    L = batchchol(a)
    ys = [b[..., i, :] for i in range(n)]
    for i in range(n):
        for j in range(i):
            ys[i] = ys[i] - L[..., i, j][..., None] * ys[j]
        ys[i] = ys[i] / L[..., i, i][..., None]
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, n):
            ys[i] = ys[i] - L[..., j, i][..., None] * ys[j]
        ys[i] = ys[i] / L[..., i, i][..., None]
    x = jnp.stack(ys, axis=-2)
    return x[..., 0] if vector else x
