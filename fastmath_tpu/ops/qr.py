"""Batched QR machinery and symmetric eigendecomposition.

Capability parity with the reference's ``qr`` module
(``nitorch_fastmath/qr.py`` + ``_impl/qr.py``): ``eig_sym``,
``qr_hessenberg``, ``rq_hessenberg``, ``hessenberg``,
``hessenberg_sym``, ``householder``, ``householder_apply``, ``givens``,
``givens_apply`` — all batched over arbitrary leading dims, with the
same validation flags (``check_finite``, ``inplace`` accepted for API
compatibility; JAX is functional so ``inplace`` is a no-op).

TPU-first redesign notes:

* **eig_sym uses batched cyclic Jacobi**, not the reference's explicit
  shifted-QR with per-eigenvalue deflation (``_impl/qr.py:533-657``).
  Jacobi is the natural choice for *huge batches of small matrices* on
  a vector machine: every rotation is a static-shape elementwise update
  over the whole batch, convergence is quadratic, eigenvectors
  accumulate for free, and — crucially — a converged matrix's rotations
  degenerate to identity, so per-matrix convergence needs **no masks at
  all**. This also fixes the reference's batch-global convergence stall
  (one slow matrix blocking the whole batch, ``_impl/qr.py:600-605``;
  SURVEY.md appendix).
* Eigenvalues are **not sorted** (reference contract, ``qr.py:45-63``).
* The backward pass is the Giles (2008) eigen-gradient as a
  ``custom_vjp`` (reference ``_impl/qr.py:714-735``); eigenvectors are
  computed in the forward whenever gradients are needed.
* Householder/Hessenberg/Givens loops are trace-time Python loops over
  the (small, static) matrix dimension — one fused XLA program, no
  host-side iteration.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "eig_sym",
    "qr_hessenberg",
    "rq_hessenberg",
    "hessenberg",
    "hessenberg_sym",
    "householder",
    "householder_apply",
    "givens",
    "givens_apply",
]


def _check_finite_square(a, check_finite: bool, square: bool = True, name="input"):
    a = jnp.asarray(a)
    if check_finite and not isinstance(a, jax.core.Tracer):
        if not bool(jnp.all(jnp.isfinite(a))):
            raise ValueError("Input has non finite values.")
    if square and a.shape[-1] != a.shape[-2]:
        raise ValueError(
            f"Expected square matrix. Got ({a.shape[-2]}, {a.shape[-1]})"
        )
    return a


# ---------------------------------------------------------------------------
# Householder
# ---------------------------------------------------------------------------


def householder(
    x,
    basis: int = 0,
    inplace: bool = False,
    check_finite: bool = True,
    return_alpha: bool = False,
):
    r"""Householder vector ``u`` of ``x`` such that
    ``(I - 2 u u^H) x = alpha e_basis`` with
    ``alpha = -||x|| exp(i angle(x_basis))``.

    Reference analog: ``qr.py:278-327`` / ``_impl/qr.py:55-70``.
    """
    x = jnp.asarray(x)
    if check_finite and not isinstance(x, jax.core.Tracer):
        if not bool(jnp.all(jnp.isfinite(x))):
            raise ValueError("Input has non finite values.")
    nrm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    xb = x[..., basis : basis + 1]
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        phase = jnp.where(
            jnp.abs(xb) > 0, xb / jnp.maximum(jnp.abs(xb), 1e-300), 1.0 + 0j
        )
    else:
        phase = jnp.where(xb >= 0, 1.0, -1.0)
    alpha = -phase * nrm
    u = x - alpha * jnp.zeros_like(x).at[..., basis].set(1.0)
    unrm = jnp.linalg.norm(u, axis=-1, keepdims=True)
    # zero-norm guard (reference ``_impl/qr.py:67``): null vector -> u = 0
    safe = unrm > 0
    u = jnp.where(safe, u / jnp.where(safe, unrm, 1.0), 0.0)
    alpha = alpha[..., 0]
    return (u, alpha) if return_alpha else u


def _apply_reflector_left(a, u):
    # A <- A - 2 u (u^H A)
    uh_a = jnp.einsum("...i,...ij->...j", jnp.conjugate(u), a, precision="highest")
    return a - 2.0 * u[..., :, None] * uh_a[..., None, :]


def _apply_reflector_right(a, u):
    # A <- A - 2 (A u) u^H
    a_u = jnp.einsum("...ij,...j->...i", a, u, precision="highest")
    return a - 2.0 * a_u[..., :, None] * jnp.conjugate(u)[..., None, :]


def householder_apply(
    a,
    u,
    k=None,
    side: str = "both",
    inverse: bool = False,
    inplace: bool = False,
    check_finite: bool = True,
):
    r"""Apply a sequence of Householder reflectors ``{u_k}`` to ``a``:
    ``H = U A U^H`` (side='both'), ``U A`` (left) or ``A U^H`` (right),
    with ``U = P_K ... P_1``, ``P_k = I - 2 u_k u_k^H``. ``inverse``
    applies the reflectors in the opposite order (each P is Hermitian
    and involutive). Reference analog: ``qr.py:330-372`` /
    ``_impl/qr.py:72-114``.

    ``k`` replicates the reference's behavior exactly
    (``_impl/qr.py:86-88``: ``zip(ensure_list(k), u)``): its *length*
    selects how many leading reflectors are applied — an int applies
    exactly one, a list/range of length m applies the first m, ``None``
    applies all. (The reference never reads the k *values*.)

    Reflectors shorter than n act on the trailing ``len(u_k)`` rows/
    columns (the reference's ``k0 = n - len(u_k)`` offset,
    ``_impl/qr.py:95-103``) — here realized by zero-padding at the
    front, which is algebraically identical.
    """
    a = _check_finite_square(a, check_finite)
    n = a.shape[-1]
    if isinstance(u, (list, tuple)):
        us = list(u)
    else:
        u = jnp.asarray(u)
        if u.ndim >= 2 and u.shape[-2] != 1 and u.ndim >= a.ndim:
            # stacked (..., K, n)
            us = [u[..., i, :] for i in range(u.shape[-2])]
        else:
            us = [u]
    # reference order of operations (``_impl/qr.py:76-88``): reverse
    # the list FIRST when inverse, THEN zip-truncate against k — so
    # inverse+k applies the *last* len(k) reflectors, in reverse order
    if inverse:
        us = us[::-1]
    if k is not None:
        if isinstance(k, range):
            k = list(k)
        n_apply = len(k) if isinstance(k, (list, tuple)) else 1
        us = us[:n_apply]
    for uk in us:
        uk = jnp.asarray(uk)
        if uk.shape[-1] < n:
            pad = [(0, 0)] * (uk.ndim - 1) + [(n - uk.shape[-1], 0)]
            uk = jnp.pad(uk, pad)
        if side in ("left", "both"):
            a = _apply_reflector_left(a, uk)
        if side in ("right", "both"):
            a = _apply_reflector_right(a, uk)
    return a


# ---------------------------------------------------------------------------
# Hessenberg
# ---------------------------------------------------------------------------


def hessenberg(
    a,
    inplace: bool = False,
    check_finite: bool = True,
    compute_u: bool = False,
):
    """Reduce to (upper) Hessenberg form by n-2 Householder similarity
    transforms; trace-time loop, one fused program.

    Returns ``h`` (and the stacked reflectors ``u (..., n-2, n)`` when
    ``compute_u``). Reference analog: ``qr.py:184-223`` /
    ``_impl/qr.py:117-141``.
    """
    a = _check_finite_square(a, check_finite)
    n = a.shape[-1]
    us = []
    for k in range(n - 2):
        col = a[..., :, k]
        # zero out entries <= k so the reflector acts on rows k+1..n-1
        tail = col * jnp.asarray(
            (np.arange(n) >= k + 1).astype(float), dtype=a.real.dtype
        )
        u = householder(tail, basis=k + 1, check_finite=False)
        a = _apply_reflector_left(a, u)
        a = _apply_reflector_right(a, u)
        us.append(u)
    # clean numerical noise below the first subdiagonal
    rows = np.arange(n)[:, None]
    cols = np.arange(n)[None, :]
    keep = jnp.asarray(rows <= cols + 1)
    h = jnp.where(keep, a, jnp.zeros((), a.dtype))
    if compute_u:
        ustack = jnp.stack(us, axis=-2) if us else jnp.zeros((*a.shape[:-2], 0, n), a.dtype)
        return h, ustack
    return h


def hessenberg_sym(
    a,
    upper: bool = True,
    fill: bool = True,
    inplace: bool = False,
    check_finite: bool = True,
    compute_u: bool = False,
):
    """Tridiagonalize a Hermitian matrix using only its ``upper`` or
    lower triangle. ``fill=False`` returns only the requested triangle
    of the tridiagonal result. Reference analog: ``qr.py:226-275`` /
    ``_impl/qr.py:280-323``.
    """
    a = _check_finite_square(a, check_finite)
    n = a.shape[-1]
    rows = np.arange(n)[:, None]
    cols = np.arange(n)[None, :]
    keep = rows <= cols if upper else rows >= cols
    tri = jnp.where(jnp.asarray(keep), a, jnp.zeros((), a.dtype))
    # symmetrize from the chosen triangle; the diagonal (real for a
    # Hermitian input) would otherwise be counted twice
    eye = jnp.eye(n, dtype=a.dtype)
    diag = jnp.real(jnp.diagonal(a, axis1=-2, axis2=-1)).astype(a.dtype)
    sym = tri + jnp.swapaxes(jnp.conjugate(tri), -1, -2) - eye * diag[..., None, :]
    out = hessenberg(sym, check_finite=False, compute_u=compute_u)
    h, us = out if compute_u else (out, None)
    if not fill:
        keep = rows <= cols if upper else rows >= cols
        keep = jnp.asarray(keep | (np.abs(rows - cols) == 0))
        h = jnp.where(keep, h, jnp.zeros((), h.dtype))
    return (h, us) if compute_u else h


# ---------------------------------------------------------------------------
# Givens
# ---------------------------------------------------------------------------


def givens(x, y):
    """Givens rotation aligning ``(x, y)`` with the first axis:
    ``c = x / r``, ``s = -y / r`` with zero-norm guard. Reference:
    ``_impl/qr.py:326-334``.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    r = jnp.hypot(x, y)
    safe = r > 0
    rs = jnp.where(safe, r, 1.0)
    c = jnp.where(safe, x / rs, 1.0)
    s = jnp.where(safe, -y / rs, 0.0)
    return c, s


def _givens_rows(a, c, s, i, j):
    """Left-multiply by G^T acting on rows i, j: rows <- [c ri - s rj;
    s ri + c rj] (rotation convention matching :func:`givens`)."""
    ri = a[..., i, :]
    rj = a[..., j, :]
    c = c[..., None]
    s = s[..., None]
    a = a.at[..., i, :].set(c * ri - s * rj)
    a = a.at[..., j, :].set(s * ri + c * rj)
    return a


def _givens_cols(a, c, s, i, j):
    ci_ = a[..., :, i]
    cj_ = a[..., :, j]
    c = c[..., None] if jnp.ndim(c) == jnp.ndim(ci_) - 1 else c
    s = s[..., None] if jnp.ndim(s) == jnp.ndim(cj_) - 1 else s
    a = a.at[..., :, i].set(c * ci_ - s * cj_)
    a = a.at[..., :, j].set(s * ci_ + c * cj_)
    return a


def givens_apply(
    a,
    c,
    s,
    i: int = 0,
    j: Optional[int] = None,
    side: str = "both",
    inplace: bool = False,
    check_finite: bool = True,
):
    """Apply a Givens rotation in the (i, j) plane to rows and/or
    columns of ``a``. Reference analog: ``qr.py:375-423`` /
    ``_impl/qr.py:405-429``.
    """
    a = _check_finite_square(a, check_finite)
    j = i + 1 if j is None else j
    c = jnp.asarray(c)
    s = jnp.asarray(s)
    if side in ("left", "both"):
        a = _givens_rows(a, c, s, i, j)
    if side in ("right", "both"):
        a = _givens_cols(a, c, s, i, j)
    return a


# ---------------------------------------------------------------------------
# QR / RQ of Hessenberg matrices (n-1 Givens rotations, trace-time loop)
# ---------------------------------------------------------------------------


def qr_hessenberg(h, inplace: bool = False, check_finite: bool = True):
    """QR decomposition of a Hessenberg matrix via n-1 Givens rotations.

    Returns ``(q, r)``. Reference analog: ``qr.py:145-182`` /
    ``_impl/qr.py:432-455``.
    """
    h = _check_finite_square(h, check_finite)
    n = h.shape[-1]
    r = h
    q = jnp.broadcast_to(jnp.eye(n, dtype=h.dtype), h.shape)
    for k in range(n - 1):
        c, s = givens(r[..., k, k], r[..., k + 1, k])
        r = _givens_rows(r, c, s, k, k + 1)
        q = _givens_cols(q, c, s, k, k + 1)
    return q, r


def rq_hessenberg(h, u=None, inplace: bool = False, check_finite: bool = True):
    """Fused ``R @ Q`` of the QR decomposition of a Hessenberg matrix
    (one pass of 2(n-1) Givens applications — the QR-iteration kernel).
    Optionally rotates vector batches ``u`` by ``Q`` as well (the
    eigenvector accumulation path, reference ``_impl/qr.py:489-531``).

    Reference analog: ``qr.py:103-143`` / ``_impl/qr.py:457-487``.
    """
    h = _check_finite_square(h, check_finite)
    n = h.shape[-1]
    r = h
    rots = []
    for k in range(n - 1):
        c, s = givens(r[..., k, k], r[..., k + 1, k])
        r = _givens_rows(r, c, s, k, k + 1)
        rots.append((c, s))
    for k, (c, s) in enumerate(rots):
        r = _givens_cols(r, c, s, k, k + 1)
        if u is not None:
            u = _givens_cols(jnp.asarray(u), c, s, k, k + 1)
    return (r, u) if u is not None else r


# ---------------------------------------------------------------------------
# eig_sym: batched cyclic Jacobi with Giles custom VJP
# ---------------------------------------------------------------------------

_JACOBI_SWEEPS_MAX = 30


def _jacobi_sweep(a, v):
    """One cyclic Jacobi sweep over all (p, q) pairs (trace-time loop).
    Rotations on converged matrices vanish (a_pq = 0 -> identity).

    Handles real symmetric and complex Hermitian input: the (p, q)
    rotation is ``J = [[c, -conj(s)], [s, c]]`` with ``s = sigma *
    exp(-i phi)``, ``phi = angle(a_pq)`` — for real input this reduces
    to the classic Golub & Van Loan rotation.
    """
    n = a.shape[-1]
    is_complex = jnp.issubdtype(a.dtype, jnp.complexfloating)
    for p in range(n - 1):
        for q in range(p + 1, n):
            apq = a[..., p, q]
            app = jnp.real(a[..., p, p])
            aqq = jnp.real(a[..., q, q])
            r = jnp.abs(apq)
            active = r > 0
            rsafe = jnp.where(active, r, 1.0)
            # stable Jacobi rotation (Golub & Van Loan alg. 8.4.1)
            tau = (aqq - app) / (2.0 * rsafe)
            # zero condition (c^2 - sigma^2) r + c sigma (aqq - app) = 0
            # -> small root t = -sign(tau) / (|tau| + sqrt(1 + tau^2))
            sgn = jnp.where(tau >= 0, 1.0, -1.0)
            t = -sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(active, t, 0.0)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            sigma = t * c
            # phase of a_pq (for real input this is its sign)
            phase = jnp.where(active, apq / rsafe.astype(a.dtype),
                              jnp.ones((), a.dtype))
            s = sigma.astype(a.dtype) * jnp.conjugate(phase)
            cB = c[..., None].astype(a.dtype)
            sB = s[..., None]
            # A <- J^H A J:  rows by J^H = [[c, conj(s)], [-s, c]]
            rp = a[..., p, :]
            rq = a[..., q, :]
            a = a.at[..., p, :].set(cB * rp + jnp.conjugate(sB) * rq)
            a = a.at[..., q, :].set(-sB * rp + cB * rq)
            # cols by J: col_p' = c col_p + s col_q
            cp = a[..., :, p]
            cq = a[..., :, q]
            a = a.at[..., :, p].set(cB * cp + sB * cq)
            a = a.at[..., :, q].set(-jnp.conjugate(sB) * cp + cB * cq)
            # hygiene: force the zeroed pair exactly
            a = a.at[..., p, q].set(0.0)
            a = a.at[..., q, p].set(0.0)
            vp = v[..., :, p]
            vq = v[..., :, q]
            v = v.at[..., :, p].set(cB * vp + sB * vq)
            v = v.at[..., :, q].set(-jnp.conjugate(sB) * vp + cB * vq)
    return a, v


#: above this n the XLA path uses the rounds-rolled parallel-order
#: sweep: the trace-unrolled cyclic sweep emits n(n-1)/2 rotation
#: stanzas and its CPU compile explodes (measured 4 min at n=28),
#: while the rolled body is O(1) ops and compiles in seconds.
_XLA_ROLLED_MIN_N = 17


def _round_robin_partners(n: int) -> np.ndarray:
    """Static round-robin tournament partner table, shape ``(R, n)``:
    ``partners[r, i]`` is row i's rotation partner in round r (self =
    bye, only for odd n). Each round's pairs are disjoint, so all n/2
    rotations of a round commute and can be applied as three full-matrix
    vector ops — the same parallel-order schedule as the Pallas rolled
    kernel (``kernels/eig_pallas.py``), here with XLA gathers. R = n-1
    rounds for even n (n for odd n) cover every (p, q) pair exactly
    once per sweep (circle method: fix player 0, rotate the rest).
    """
    m = n if n % 2 == 0 else n + 1
    others = list(range(1, m))
    rounds = []
    for _ in range(m - 1):
        players = [0] + others
        part = np.arange(n)
        for i in range(m // 2):
            x, y = players[i], players[m - 1 - i]
            if x < n and y < n:
                part[x], part[y] = y, x
        rounds.append(part)
        others = others[-1:] + others[:-1]
    return np.stack(rounds).astype(np.int32)


def _jacobi_sweep_rolled(a, v, partners):
    """One parallel-order Jacobi sweep as a ``fori_loop`` over rounds.

    ``partners`` is the traced ``(R, n)`` int32 table from
    :func:`_round_robin_partners`. Each round computes all of its n/2
    disjoint rotations **per row** in self-as-p orientation (row i's
    coefficients come out right for both pair members: the q side's
    ``tau``/``phase`` flip signs consistently, see the algebra in
    :func:`_jacobi_sweep`) and applies them as
    ``A <- c*A + conj(s)*A[partner-rows]`` followed by the column and
    eigenvector updates ``X <- c*X + s*X[:, partner]``. Identical
    mathematics to the unrolled cyclic sweep — only the rotation
    *order* differs (parallel/tournament vs row-cyclic; both converge,
    Golub & Van Loan §8.5.3/8.5.10) — with an O(1)-size loop body, so
    the XLA compile stays seconds where the unrolled sweep's n(n-1)/2
    stanzas take minutes at n ~ 28.
    """
    n = a.shape[-1]
    col = jnp.arange(n)

    def round_body(r, carry):
        a, v = carry
        part = jax.lax.dynamic_index_in_dim(partners, r, 0, keepdims=False)
        active = part != col
        d = jnp.real(jnp.diagonal(a, axis1=-2, axis2=-1))
        dp = jnp.take(d, part, axis=-1)
        # a[..., i, part[i]] — row i's off-diagonal pivot
        offd = jnp.take_along_axis(
            a, jnp.broadcast_to(part[:, None], a.shape[:-1] + (1,)), -1
        )[..., 0]
        rr = jnp.abs(offd)
        act = active & (rr > 0)
        rsafe = jnp.where(act, rr, 1.0)
        tau = (dp - d) / (2.0 * rsafe)
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = jnp.where(act,
                      -sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)), 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        sigma = t * c
        phase = jnp.where(act, offd / rsafe.astype(a.dtype),
                          jnp.ones((), a.dtype))
        s = sigma.astype(a.dtype) * jnp.conjugate(phase)
        cB = c.astype(a.dtype)
        # rows: row_i <- c_i row_i + conj(s_i) row_{part[i]}
        a = cB[..., :, None] * a \
            + jnp.conjugate(s)[..., :, None] * jnp.take(a, part, axis=-2)
        # cols: col_i <- c_i col_i + s_i col_{part[i]} (same coefficients
        # work for both pair members — the q side's s is -conj(p's))
        a = cB[..., None, :] * a + s[..., None, :] * jnp.take(a, part, axis=-1)
        # hygiene: force the zeroed pairs exactly (both (i, part[i]) and
        # (part[i], i) are covered since both rows are active)
        zero_mask = act[..., :, None] & (col[None, :] == part[:, None])
        a = jnp.where(zero_mask, jnp.zeros((), a.dtype), a)
        v = cB[..., None, :] * v + s[..., None, :] * jnp.take(v, part, axis=-1)
        return a, v

    a, v = jax.lax.fori_loop(0, partners.shape[0], round_body, (a, v))
    return a, v


def _eig_sym_fwd_impl(a, max_sweeps: int, tol: float):
    """Batched cyclic Jacobi. Returns (eigenvalues, eigenvectors).

    Convergence is tested **relative to the (rotation-invariant)
    Frobenius norm**, per matrix, exactly like the Pallas kernel
    (``kernels/eig_pallas.py``): exit once every matrix's off-diagonal
    mass is at round-off, ``off^2 <= fro^2 * 16 eps^2``. An absolute
    test (the reference's semantics, ``_impl/qr.py:600-605``) would
    never fire in f32 — off^2 cannot reach 1e-32 for any O(1)-norm
    matrix — so every call would pay all ``max_sweeps`` sweeps. ``tol``
    acts as an additional absolute floor on the off-diagonal mass.
    Non-finite matrices are excluded from the batch-global test.
    """
    n = a.shape[-1]
    v0 = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    eps = float(jnp.finfo(a.dtype).eps)
    fro2 = jnp.sum(jnp.abs(a) ** 2, axis=(-2, -1))
    thresh = jnp.maximum(fro2 * (16.0 * eps * eps), tol)

    def off(m):
        m2 = jnp.abs(m) ** 2
        return jnp.sum(m2, axis=(-2, -1)) - jnp.sum(
            jnp.diagonal(m2, axis1=-2, axis2=-1), axis=-1
        )

    def cond(carry):
        a, v, it = carry
        o = off(a)
        active = jnp.isfinite(o) & (o > thresh)
        return (it < max_sweeps) & jnp.any(active)

    if n >= _XLA_ROLLED_MIN_N:
        # rounds-rolled parallel-order sweep: O(1) loop body, seconds
        # to compile where the unrolled sweep's n(n-1)/2 stanzas take
        # minutes (4 min at n=28 on CPU XLA, measured round 4)
        partners = jnp.asarray(_round_robin_partners(n))

        def body(carry):
            a, v, it = carry
            a, v = _jacobi_sweep_rolled(a, v, partners)
            return a, v, it + 1
    else:

        def body(carry):
            a, v, it = carry
            a, v = _jacobi_sweep(a, v)
            return a, v, it + 1

    a, v, _ = jax.lax.while_loop(cond, body, (a, v0, jnp.asarray(0)))
    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    return w, v


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _eig_sym_core(a, max_sweeps: int, tol: float):
    return _eig_sym_fwd_impl(a, max_sweeps, tol)


def _eig_sym_core_fwd(a, max_sweeps, tol):
    w, v = _eig_sym_fwd_impl(a, max_sweeps, tol)
    return (w, v), (w, v)


def _giles_da(w, u, dw, du):
    """Giles (2008) eigendecomposition backward:
    dA = U (diag(dw) + F o (U^T dU)) U^T, F_ij = 1/(w_j - w_i)
    off-diagonal, 0 on the diagonal; symmetrized (the input is
    symmetric, so the gradient lives on the symmetric subspace).
    Reference analog: _impl/qr.py:714-735. ``du`` may be None
    (eigenvalues-only cotangent)."""
    from .batched import batchmatmul as _bmm

    n = w.shape[-1]
    eye = jnp.eye(n, dtype=w.dtype)
    inner = eye * dw[..., :, None]
    # matmuls via batchmatmul: trace-time unrolled VPU form at
    # n <= 6 (~10x dot_general for tiny per-item products), XLA
    # dot_general at precision="highest" beyond — same contraction as
    # the einsums it replaces
    if du is not None:
        ut_du = _bmm(jnp.swapaxes(u, -1, -2), du)
        diff = w[..., None, :] - w[..., :, None]
        f = jnp.where(
            jnp.abs(diff) > 1e-300, 1.0 / jnp.where(diff == 0, 1.0, diff), 0.0
        )
        f = f * (1.0 - eye)
        inner = inner + f * ut_du
    da = _bmm(_bmm(u, inner), jnp.swapaxes(u, -1, -2))
    return 0.5 * (da + jnp.swapaxes(da, -1, -2))


def _eig_sym_core_bwd(max_sweeps, tol, res, cot):
    w, u = res
    dw, du = cot
    return (_giles_da(w, u, dw, du),)


_eig_sym_core.defvjp(_eig_sym_core_fwd, _eig_sym_core_bwd)


# --- Pallas fast path (real dtypes, n <= 8, channel-first kernel) ----------


def _pallas_eig(sym, sweeps, compute_u):
    """Run the lane-packed Pallas Jacobi on a batch-last symmetric
    input: (..., n, n) -> w (..., n) [, u (..., n, n)]."""
    from ..kernels.eig_pallas import eig_sym_cf
    from ..layouts.sym import full_to_sym

    n = sym.shape[-1]
    batch_shape = sym.shape[:-2]
    cf = jnp.moveaxis(full_to_sym(sym).reshape(-1, n * (n + 1) // 2), -1, 0)
    # bm=True: the lazy batch-major transpose above composes with the
    # kernel's block-major repack into one block-local relayout — the
    # same trick that closed the solve path's routed-vs-direct gap.
    # block: the kernel default (8192) left the routed path ~25% below
    # kernel-direct at 4x4 (BENCH r3/r4) — fewer, larger grid steps
    # amortize the per-step DMA. Live rows = nn in + n w (+ n^2 u),
    # x block x 4 B x 2 (double buffer): 32768 at n <= 4 values-only
    # (14 rows -> 3.7 MB), 16384 with vectors (30 rows -> 3.9 MB),
    # 8192 for 5 <= n <= 8 (up to 108 rows -> 7.1 MB); the rolled
    # n > 8 tier pins its own block (1024) internally.
    if n <= 4:
        block = 16384 if compute_u else 32768
    else:
        block = 8192
    out = eig_sym_cf(cf, compute_u=compute_u, sweeps=sweeps, block=block,
                     bm=True)
    if compute_u:
        w_cf, u_cf = out
    else:
        w_cf = out
    w = jnp.moveaxis(w_cf, 0, -1).reshape(*batch_shape, n)
    if not compute_u:
        return w
    u = jnp.moveaxis(u_cf, 0, -1).reshape(*batch_shape, n, n)
    return w, u


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _eig_pallas_w(sym, sweeps):
    return _pallas_eig(sym, sweeps, compute_u=False)


def _eig_pallas_w_fwd(sym, sweeps):
    w, u = _pallas_eig(sym, sweeps, compute_u=True)
    return w, (w, u)


def _eig_pallas_w_bwd(sweeps, res, dw):
    w, u = res
    return (_giles_da(w, u, dw, None),)


_eig_pallas_w.defvjp(_eig_pallas_w_fwd, _eig_pallas_w_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _eig_pallas_wu(sym, sweeps):
    return _pallas_eig(sym, sweeps, compute_u=True)


def _eig_pallas_wu_fwd(sym, sweeps):
    w, u = _pallas_eig(sym, sweeps, compute_u=True)
    return (w, u), (w, u)


def _eig_pallas_wu_bwd(sweeps, res, cot):
    w, u = res
    dw, du = cot
    return (_giles_da(w, u, dw, du),)


_eig_pallas_wu.defvjp(_eig_pallas_wu_fwd, _eig_pallas_wu_bwd)

_EIG_PALLAS_MAX_N = 32


# --- Analytic closed-form path (real symmetric, n <= 3) --------------------
#
# The DTI regime — millions of 2x2/3x3 symmetric tensors — has exact
# closed forms: 2x2 via one Jacobi rotation angle, 3x3 via the stable
# trigonometric (Cardano) solution of the characteristic cubic on the
# trace-free part (the standard formulation, cf. Kopp 2008, "Efficient
# numerical diagonalization of hermitian 3x3 matrices"). Unlike the
# iterative Jacobi tiers this is a handful of *elementwise* XLA ops —
# stream-bound instead of VPU-iteration-bound, so it wins on every
# backend (no kernel needed; XLA fuses the whole thing). Accuracy is
# absolute ~eps * ||A|| like Jacobi's. Inputs are pre-scaled by the
# per-matrix max |entry| so the squared invariants (tr(B^2), det B)
# stay inside f32 range at any input scale.
#
# No counterpart in the reference (its shifted-QR iterates even at
# n = 2, `_impl/qr.py:533-657`); the closed-form *solve* analog is its
# TorchScript `_sym_solve2/3` tier (`_impl/sym.py:194-252`).

_TWO_PI_3 = 2.0943951023931953  # 2*pi/3


def _analytic_prescale(sym):
    s = jnp.max(jnp.abs(sym), axis=(-2, -1))
    safe = jnp.where(s > 0, s, jnp.ones((), sym.dtype))
    return sym / safe[..., None, None], safe


def _eig2_analytic_rot(sym):
    """2x2 closed form: the single Jacobi rotation that diagonalizes.

    Returns ``(w, (c, s))`` with ``w`` paired to the rotation columns
    ``u0 = (c, s)``, ``u1 = (-s, c)`` — exactly orthonormal by
    construction, well-defined even for degenerate eigenvalues.
    """
    a = sym[..., 0, 0]
    b = sym[..., 1, 1]
    d = sym[..., 0, 1]
    one = jnp.ones((), sym.dtype)
    zero_d = d == 0
    safe_d = jnp.where(zero_d, one, d)
    # smaller-magnitude root of t^2 + 2 tau t - 1 = 0, tau = (a-b)/(2d)
    tau = (a - b) / (2 * safe_d)
    sgn = jnp.where(tau >= 0, one, -one)
    t = jnp.where(zero_d, 0.0, sgn / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau)))
    c = 1.0 / jnp.sqrt(1 + t * t)
    s = t * c
    w = jnp.stack([a + t * d, b - t * d], axis=-1)
    return w, (c, s)


def _eig3_analytic_w(sym, want_u: bool = False):
    """3x3 closed form (descending), matrix-level accurate.

    Trigonometric (Cardano) roots of the characteristic cubic of the
    trace-free part are the *seeds*: roots-from-coefficients are only
    ~sqrt(eps)-accurate for clustered pairs (the coefficients do not
    determine a double root better). A branch-free deflation pass then
    restores ~eps * ||A|| absolute accuracy for every root: take the
    best-*separated* seed, form its (unnormalized) spectral projector
    ``(A - la I)(A - lb I)`` from the other two seeds, read its
    eigenvector off the largest projector column (seed error enters the
    *direction* only at first order, the restricted matrix at second),
    Rayleigh-refine the separated root, and re-solve the clustered pair
    exactly as the orthogonal 2x2 restriction of A to the complement —
    a backward-stable reduction. Everything stays elementwise.
    """
    dt = sym.dtype
    a = sym[..., 0, 0]
    b = sym[..., 1, 1]
    c = sym[..., 2, 2]
    d = sym[..., 0, 1]
    e = sym[..., 0, 2]
    f = sym[..., 1, 2]
    q = (a + b + c) / 3
    x, y, z = a - q, b - q, c - q
    p2 = x * x + y * y + z * z + 2 * (d * d + e * e + f * f)
    p = jnp.sqrt(p2 / 6)
    safe_p = jnp.where(p > 0, p, jnp.ones((), dt))
    xb, yb, zb = x / safe_p, y / safe_p, z / safe_p
    db, eb, fb = d / safe_p, e / safe_p, f / safe_p
    det_b = (xb * (yb * zb - fb * fb)
             - db * (db * zb - fb * eb)
             + eb * (db * fb - yb * eb))
    r = jnp.clip(det_b / 2, -1.0, 1.0)
    phi = jnp.arccos(r) / 3
    w0 = q + 2 * p * jnp.cos(phi)            # phi in [0, pi/3] -> largest
    w2 = q + 2 * p * jnp.cos(phi + _TWO_PI_3)  # smallest
    w1 = 3 * q - w0 - w2

    # --- deflation refine -------------------------------------------------
    top_sep = (w0 - w1) >= (w1 - w2)
    lsep = jnp.where(top_sep, w0, w2)
    la = jnp.where(top_sep, w1, w0)
    lb = jnp.where(top_sep, w2, w1)
    # columns of P = (A - la I)(A - lb I): unnormalized projector onto
    # the separated eigenvector
    a1, b1, c1 = a - la, b - la, c - la
    a2, b2, c2 = a - lb, b - lb, c - lb
    p00 = a1 * a2 + d * d + e * e
    p10 = d * a2 + b1 * d + f * e
    p20 = e * a2 + f * d + c1 * e
    p01 = a1 * d + d * b2 + e * f
    p11 = d * d + b1 * b2 + f * f
    p21 = e * d + f * b2 + c1 * f
    p02 = a1 * e + d * f + e * c2
    p12 = d * e + b1 * f + f * c2
    p22 = e * e + f * f + c1 * c2
    n0 = p00 * p00 + p10 * p10 + p20 * p20
    n1 = p01 * p01 + p11 * p11 + p21 * p21
    n2 = p02 * p02 + p12 * p12 + p22 * p22
    use0 = (n0 >= n1) & (n0 >= n2)
    use1 = jnp.logical_and(~use0, n1 >= n2)
    ux = jnp.where(use0, p00, jnp.where(use1, p01, p02))
    uy = jnp.where(use0, p10, jnp.where(use1, p11, p12))
    uz = jnp.where(use0, p20, jnp.where(use1, p21, p22))
    bestn = jnp.where(use0, n0, jnp.where(use1, n1, n2))
    # (near-)triple cluster: projector vanishes, any direction works
    # (the restriction perturbs eigenvalues only by the cluster spread)
    degen = bestn <= jnp.zeros((), dt)
    ux = jnp.where(degen, jnp.ones((), dt), ux)
    uy = jnp.where(degen, jnp.zeros((), dt), uy)
    uz = jnp.where(degen, jnp.zeros((), dt), uz)
    un = jnp.sqrt(ux * ux + uy * uy + uz * uz)
    ux, uy, uz = ux / un, uy / un, uz / un
    # orthonormal basis (v, s) of the complement: subtract u from the
    # least-aligned coordinate axis
    ax_, ay_, az_ = jnp.abs(ux), jnp.abs(uy), jnp.abs(uz)
    use_x = (ax_ <= ay_) & (ax_ <= az_)
    use_y = jnp.logical_and(~use_x, ay_ <= az_)
    one = jnp.ones((), dt)
    zero = jnp.zeros((), dt)
    ek_x = jnp.where(use_x, one, zero)
    ek_y = jnp.where(use_y, one, zero)
    ek_z = jnp.where(use_x | use_y, zero, one)
    uk = jnp.where(use_x, ux, jnp.where(use_y, uy, uz))
    tx, ty, tz = ek_x - uk * ux, ek_y - uk * uy, ek_z - uk * uz
    tn = jnp.sqrt(tx * tx + ty * ty + tz * tz)  # >= sqrt(2/3): safe
    vx, vy, vz = tx / tn, ty / tn, tz / tn
    sx = uy * vz - uz * vy
    sy = uz * vx - ux * vz
    sz = ux * vy - uy * vx

    def _amv(px, py, pz):  # A @ (px, py, pz), elementwise
        return (a * px + d * py + e * pz,
                d * px + b * py + f * pz,
                e * px + f * py + c * pz)

    avx, avy, avz = _amv(vx, vy, vz)
    asx, asy, asz = _amv(sx, sy, sz)
    aux, auy, auz = _amv(ux, uy, uz)
    q11 = vx * avx + vy * avy + vz * avz
    q12 = sx * avx + sy * avy + sz * avz
    q22 = sx * asx + sy * asy + sz * asz
    lsep_r = ux * aux + uy * auy + uz * auz  # Rayleigh quotient
    # 2x2 closed form on the restriction (backward stable)
    zero_q = q12 == 0
    safe_q = jnp.where(zero_q, one, q12)
    tau = (q11 - q22) / (2 * safe_q)
    sgn = jnp.where(tau >= 0, one, -one)
    t = jnp.where(zero_q, zero,
                  sgn / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau)))
    wa = q11 + t * q12
    wb = q22 - t * q12
    if not want_u:
        # descending merge
        hi = jnp.maximum(wa, wb)
        lo = jnp.minimum(wa, wb)
        o0 = jnp.maximum(lsep_r, hi)
        o2 = jnp.minimum(lsep_r, lo)
        o1 = lsep_r + hi + lo - o0 - o2
        return jnp.stack([o0, o1, o2], axis=-1)

    # eigenvectors ride the same machinery for free: (u, v, s) is an
    # exactly orthonormal triple by construction and the 2x2 rotation
    # resolves the clustered pair inside span{v, s} — so U is exactly
    # orthogonal; only the *directions* carry the (properly
    # conditioned, gap-relative) eigenvector error.
    ct = 1.0 / jnp.sqrt(1 + t * t)
    st = t * ct
    ya = jnp.stack([ct * vx + st * sx, ct * vy + st * sy,
                    ct * vz + st * sz], axis=-1)
    yb = jnp.stack([-st * vx + ct * sx, -st * vy + ct * sy,
                    -st * vz + ct * sz], axis=-1)
    usep = jnp.stack([ux, uy, uz], axis=-1)

    def cswap(lam1, vec1, lam2, vec2):  # descending compare-swap
        cond = lam1 >= lam2
        cv = cond[..., None]
        return (jnp.where(cond, lam1, lam2), jnp.where(cv, vec1, vec2),
                jnp.where(cond, lam2, lam1), jnp.where(cv, vec2, vec1))

    l0, v0, l1, v1 = lsep_r, usep, wa, ya
    l2, v2 = wb, yb
    l0, v0, l1, v1 = cswap(l0, v0, l1, v1)
    l1, v1, l2, v2 = cswap(l1, v1, l2, v2)
    l0, v0, l1, v1 = cswap(l0, v0, l1, v1)
    w = jnp.stack([l0, l1, l2], axis=-1)
    u = jnp.stack([v0, v1, v2], axis=-1)  # columns = eigenvectors
    return w, u


def _eig_analytic_w_impl(sym):
    n = sym.shape[-1]
    sym_s, scale = _analytic_prescale(sym)
    if n == 1:
        w = sym_s[..., 0, :]
    elif n == 2:
        w, _ = _eig2_analytic_rot(sym_s)
    else:
        w = _eig3_analytic_w(sym_s)
    return w * scale[..., None]


@jax.custom_vjp
def _eig_analytic_w(sym):
    return _eig_analytic_w_impl(sym)


def _eig_analytic_w_fwd(sym):
    return _eig_analytic_w_impl(sym), sym


def _eig_analytic_w_bwd(sym, dw):
    # Giles eigenvalue pullback dA = sum_i dw_i u_i u_i^T with the
    # closed-form eigenvectors (pairing-consistent with the primal's
    # output order by construction at every n).
    n = sym.shape[-1]
    if n == 1:
        return (dw[..., None],)
    sym_s, _ = _analytic_prescale(sym)
    if n == 2:
        _, (c, s) = _eig2_analytic_rot(sym_s)
        u = jnp.stack(
            [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)],
            axis=-2,
        )
    else:
        _, u = _eig3_analytic_w(sym_s, want_u=True)
    da = jnp.einsum("...i,...ji,...ki->...jk", dw, u, u,
                    precision="highest")
    return (0.5 * (da + jnp.swapaxes(da, -1, -2)),)


_eig_analytic_w.defvjp(_eig_analytic_w_fwd, _eig_analytic_w_bwd)


@jax.custom_vjp
def _eig2_analytic_wu(sym):
    sym_s, scale = _analytic_prescale(sym)
    w, (c, s) = _eig2_analytic_rot(sym_s)
    u = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )
    return w * scale[..., None], u


def _eig2_analytic_wu_fwd(sym):
    w, u = _eig2_analytic_wu(sym)
    return (w, u), (w, u)


def _eig2_analytic_wu_bwd(res, cot):
    w, u = res
    dw, du = cot
    return (_giles_da(w, u, dw, du),)


_eig2_analytic_wu.defvjp(_eig2_analytic_wu_fwd, _eig2_analytic_wu_bwd)


@jax.custom_vjp
def _eig3_analytic_wu(sym):
    sym_s, scale = _analytic_prescale(sym)
    w, u = _eig3_analytic_w(sym_s, want_u=True)
    return w * scale[..., None], u


def _eig3_analytic_wu_fwd(sym):
    w, u = _eig3_analytic_wu(sym)
    return (w, u), (w, u)


def _eig3_analytic_wu_bwd(res, cot):
    w, u = res
    dw, du = cot
    return (_giles_da(w, u, dw, du),)


_eig3_analytic_wu.defvjp(_eig3_analytic_wu_fwd, _eig3_analytic_wu_bwd)


def _polish_wu(sym, w, u):
    """Second-order eigen-pair polish for an approximate symmetric /
    Hermitian eigendecomposition ``(w, u)`` of ``sym`` (9 batched
    matmuls — trivial next to the Jacobi iteration that produced it).

    The f32 Jacobi floor (CLAUDE.md round-4 findings): the *iterated
    matrix* converges but the accumulated ``U`` drifts — worst-lane
    ``off(U^T A U)`` stalls at ~4e-5..4e-4 * ||A||_F and U loses
    orthogonality at ~sqrt(#rotations) * eps ~ 1e-5, no matter how many
    extra sweeps run. Two corrections push both defects to second
    order (the same pair that took the logm sym-eig route from 1e-4 to
    3.2e-7 normwise, :func:`fastmath_tpu.ops.lie._logm_sym_eig`):

    * one Newton-Schulz step ``U <- U (3I - U^H U) / 2`` squares the
      orthogonality error away (~1e-5 -> ~1e-9);
    * first-order Rayleigh-Schroedinger correction at ``M = U^H A U``:
      eigenvalues become the Rayleigh quotients ``diag(M)`` (accurate
      to O(||E||^2), E = off(M)) and eigenvectors absorb
      ``U <- U (I + Y)``, ``Y_ij = E_ij (w_j - w_i) / ((w_j - w_i)^2 +
      theta^2)`` — a Tikhonov-damped divided difference: for resolved
      gaps it is the exact first-order term; for near-degenerate pairs
      (gap <~ theta = 1e-3 * spectral scale) it fades to zero, where
      the within-cluster off-diagonal is already O(orth-drift) because
      any orthonormal basis of the cluster is an eigenbasis. ``Y`` is
      anti-Hermitian, so ``I + Y`` preserves the fresh orthogonality
      to second order.

    Differentiable (plain composition of matmuls/selects on top of the
    Giles custom-VJP core). Reference quality contract analog:
    ``_impl/qr.py:684-735``.
    """
    from .batched import batchmatmul as _bmm

    n = u.shape[-1]
    eye = jnp.eye(n, dtype=u.dtype)
    uh = jnp.swapaxes(jnp.conjugate(u), -1, -2)
    u = _bmm(u, 1.5 * eye - 0.5 * _bmm(uh, u))
    uh = jnp.swapaxes(jnp.conjugate(u), -1, -2)
    M = _bmm(_bmm(uh, sym), u)
    w2 = jnp.real(jnp.diagonal(M, axis1=-2, axis2=-1))
    den = w2[..., None, :] - w2[..., :, None]
    scale = jnp.max(jnp.abs(w2), axis=-1)
    tiny = float(jnp.finfo(w2.dtype).tiny)
    theta = (1e-3 * scale + tiny).astype(w2.dtype)[..., None, None]
    corr = den / (den * den + theta * theta)  # real; broadcasts into E
    E = M - w2[..., :, None].astype(u.dtype) * eye
    u = _bmm(u, eye + E * corr)
    # second NS: the damped correction is anti-Hermitian only to
    # O(Y^2) ~ 1e-6 — squaring that away lands orthogonality AND
    # off(U^H A U) in the ~1e-7 class (measured: orth 2.9e-6 ->
    # 3.4e-7, off/fro 5.2e-7 -> 1.5e-7 at n=20 f32)
    uh = jnp.swapaxes(jnp.conjugate(u), -1, -2)
    u = _bmm(u, 1.5 * eye - 0.5 * _bmm(uh, u))
    return w2.astype(jnp.real(w).dtype), u


def eig_sym(
    a,
    compute_u: bool = False,
    upper: bool = True,
    inplace: bool = False,
    check_finite: bool = True,
    max_iter: int = 1024,
    tol: float = 1e-32,
    backend: str = "auto",
    polish: Optional[bool] = None,
):
    """Batched eigendecomposition of symmetric matrices via cyclic
    Jacobi (see module docstring for the redesign rationale).

    Eigenvalues are **not sorted** (reference contract ``qr.py:45-63``).
    Returns ``s`` or ``(s, u)``. ``upper`` selects which triangle to
    trust. Reference analog: ``qr.py:30-100`` / ``_impl/qr.py:660-735``.

    ``backend``: ``"auto"`` routes real input with n <= 3 to the
    closed-form **analytic** path on every platform — one Jacobi rotation angle at 2x2, the stable
    trigonometric characteristic-cubic solution at 3x3 (the DTI
    regime): pure elementwise XLA, stream-bound instead of
    iteration-bound. Larger real input with n <= 32 routes to the
    lane-packed Pallas kernels on TPU (unrolled register cyclic Jacobi
    n <= 8, ~19x the XLA path at 4x4; rolled parallel-order Jacobi on
    stacked grids 9 <= n <= 32 — ``BENCH_MEASURED.md``) and uses fused
    XLA otherwise; ``"analytic"`` / ``"pallas"`` / ``"xla"`` force a
    path. All paths carry the Giles custom VJP, so ``eig_sym`` supports
    reverse-mode AD only: forward-mode (``jax.jvp`` / ``jacfwd``) raises
    on **every** backend (``jax.custom_vjp`` has no JVP rule). For
    forward-mode derivatives of eigenvalues use the Giles identities
    directly (``dw = diag(U^T dA U)``) on the primal outputs.

    ``polish`` (needs ``compute_u=True``): one Newton-Schulz
    orthogonality step + a Tikhonov-damped first-order Rayleigh
    eigen-pair correction (:func:`_polish_wu`, 9 batched matmuls).
    Default ``None`` = auto: on for single-precision iterative paths
    (where the f32 Jacobi floor leaves ``off(U^T A U)`` at
    ~1e-4 * ||A||_F and U orthogonality at ~1e-5 — polish takes both
    to the ~1e-7 class, measured in ``tests/test_qr.py``), off for
    f64 and the exact n <= 3 analytic forms. The polish feeds the
    returned eigenvalues (Rayleigh quotients) and composes with the
    Giles VJP through ordinary AD. Measured cost on TPU (n=16, 200k
    batch, vectors): ~2.2x a bare eig call (BENCH_MEASURED.md
    ``polish=False/True`` row pair) — pass ``polish=False`` for
    throughput-first workloads that tolerate the f32 floor.
    """
    a = _check_finite_square(a, check_finite)
    from ..core.dtypes import upcast_half

    a, half = upcast_half(a)  # bf16/f16 compute in f32, round on output
    is_complex = jnp.issubdtype(a.dtype, jnp.complexfloating)
    if not is_complex and not jnp.issubdtype(a.dtype, jnp.floating):
        a = a.astype(jnp.result_type(float))
    n = a.shape[-1]
    rows = np.arange(n)[:, None]
    cols = np.arange(n)[None, :]
    keep = jnp.asarray(rows <= cols if upper else rows >= cols)
    tri = jnp.where(keep, a, jnp.zeros((), a.dtype))
    eye = jnp.eye(n, dtype=a.dtype)
    diag = jnp.real(jnp.diagonal(tri, axis1=-2, axis2=-1)).astype(a.dtype)
    sym = tri + jnp.swapaxes(jnp.conjugate(tri), -1, -2) - diag[..., None] * eye

    if backend not in ("auto", "pallas", "xla", "analytic"):
        raise ValueError(f"unknown backend {backend!r}")
    pallas_ok = not is_complex and n <= _EIG_PALLAS_MAX_N
    if backend == "pallas" and not pallas_ok:
        raise ValueError(
            "backend='pallas' requires real input with n <= "
            f"{_EIG_PALLAS_MAX_N}"
        )
    analytic_ok = not is_complex and n <= 3
    if backend == "analytic" and not analytic_ok:
        raise ValueError(
            "backend='analytic' requires real input with n <= 3"
        )
    use_analytic = backend == "analytic" or (backend == "auto" and analytic_ok)
    use_pallas = backend == "pallas" or (
        backend == "auto" and not use_analytic and pallas_ok
        and jax.default_backend() == "tpu"
        # Mosaic has no f64: auto never sends x64-on-TPU data to the
        # kernels (forced backend="pallas" still works in interpret
        # mode on CPU, where the f64 tests run)
        and float(jnp.finfo(a.dtype).eps) > 1e-10
    )
    if polish is None:
        # auto: the f32 Jacobi floor (off(U^T A U) stall ~1e-4 * fro,
        # U orthogonality drift ~1e-5) only afflicts the *iterative*
        # single-precision paths — polish there; f64 sits at ~1e-14
        # and the n <= 3 analytic forms are closed-form exact
        polish = (
            compute_u
            and n >= 2
            and not use_analytic
            and float(jnp.finfo(a.dtype).eps) > 1e-10
        )

    def _out(w, u=None):
        if u is not None and polish and n >= 2:
            w, u = _polish_wu(sym, w, u)
        if half is not None:
            w = w.astype(half)
            u = u if u is None else u.astype(half)
        return w if u is None else (w, u)

    if use_analytic:
        # closed forms; `max_iter`/`tol` are irrelevant (nothing
        # iterates). The 3x3 eigenvalues come out descending; the 2x2
        # pair follows the diagonalizing rotation — both are valid
        # instances of the unsorted contract.
        if compute_u:
            if n == 1:
                w = _eig_analytic_w(sym)
                return _out(w, jnp.ones_like(sym))
            if n == 2:
                return _out(*_eig2_analytic_wu(sym))
            return _out(*_eig3_analytic_wu(sym))
        return _out(_eig_analytic_w(sym))

    if use_pallas:
        # n <= 8: unrolled register cyclic Jacobi; 9 <= n <= 32: rolled
        # parallel-order Jacobi on stacked grids (kernels/eig_pallas.py).
        # Caps only — both kernels exit on the Frobenius-relative test.
        sweeps = 8 if n <= 4 else (10 if n <= 8 else 14)
        if compute_u:
            return _out(*_eig_pallas_wu(sym, sweeps))
        return _out(_eig_pallas_w(sym, sweeps))

    max_sweeps = int(min(max_iter, _JACOBI_SWEEPS_MAX))
    # `tol` is an absolute floor on the per-matrix off-diagonal mass;
    # the effective exit is Frobenius-relative (see _eig_sym_fwd_impl —
    # documented divergence from the reference's batch-global absolute
    # test, which in f32 would always run every sweep)
    eff_tol = float(tol) if tol else 0.0
    w, u = _eig_sym_core(sym, max_sweeps, eff_tol)
    w = jnp.real(w)
    return _out(w, u) if compute_u else _out(w)
