"""Pallas TPU kernel: batched matrix logarithm for tiny d.

The XLA inverse-scaling-and-squaring logm (:mod:`fastmath_tpu.ops.lie`)
is ~100+ fused HBM passes (ISS steps x Denman-Beavers iterations x
matmuls/inverses), each streaming the whole batch. This kernel keeps
everything in registers: per-lane masked ISS square-root depth, the
product-form Denman-Beavers iteration with closed-form adjugate
inverses, and the Gregory (atanh) series — one HBM read + one write
per batch. Reference analog: ``_impl/logm.py:102-129`` (which is a
per-matrix scipy CPU loop).

Layout: channel-first row-major full storage ``(d*d, ...)`` as in
:mod:`.expm_pallas`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sym import _det_expand
from .expm_pallas import _eye_st, _mm_st
from .sym_pallas import (
    _call_rows,
    _interpret_default,
    _sublane_block,
    _plu_grid_solve,
    _plu_rolled,
    _plu_rolled_backsub,
)

__all__ = ["logm_cf"]

_MAX_D = 8
_MAX_D_ROLLED = 24
#: flat-loop tier (single while_loop, no nested while): serves
#: 24 < d <= 32 where the nested kernel's Mosaic compile explodes
#: (>27 min at d=32 vs ~2 min at d=24 — CHANGELOG r3); the flat body
#: compiles like the expm/PLU flat kernels (~1-3 min at d=32)
_MAX_D_FLAT = 32
_ISS_MAX = 12
#: matches ops.lie._DB_ITERS: near-cut (but off-cut) eigenvalues need
#: ~log2(1/dist) iterations of the unscaled product-form iteration;
#: capping early would NaN lanes that converge fine on the XLA path
#: and reroute them through the lower-accuracy shift rescue
_DB_ITERS = 36
_THRESH = 0.25


def _mm_grid(A, B, d):
    return [
        [
            functools.reduce(
                lambda acc, k: acc + A[i][k] * B[k][j],
                range(1, d),
                A[i][0] * B[0][j],
            )
            for j in range(d)
        ]
        for i in range(d)
    ]


def _inv_grid(E, d):
    """Register-grid inverse: closed-form adjugate for d <= 4 (the
    Laplace expansion stays cheap and division-free until the final
    1/det), in-register one-hot pivoted LU with identity RHS beyond
    (the adjugate's minor count grows ~2^d; the PLU is O(d^3) and
    reuses :func:`..kernels.sym_pallas._plu_grid`'s machinery).
    Singular/NaN lanes propagate to NaN either way — the divergence
    signal the ISS loop relies on."""
    if d <= 4:
        idx = tuple(range(d))
        cache = {}
        det = _det_expand(E, idx, idx, cache)
        inv_det = 1.0 / det
        out = [[None] * d for _ in range(d)]
        for i in range(d):
            for j in range(d):
                rows = tuple(r for r in idx if r != j)
                cols = tuple(c for c in idx if c != i)
                minor = _det_expand(E, rows, cols, cache)
                cof = -minor if (i + j) % 2 else minor
                out[i][j] = cof * inv_det
        return out
    one = jnp.ones_like(E[0][0])
    zero = jnp.zeros_like(E[0][0])
    eye_cols = [
        [one if i == j else zero for i in range(d)] for j in range(d)
    ]
    xcols = _plu_grid_solve(E, eye_cols, d)  # xcols[j][i] = (E^-1)[i, j]
    return [[xcols[j][i] for j in range(d)] for i in range(d)]


def _flatten(G, d):
    return tuple(G[i][j] for i in range(d) for j in range(d))


def _unflatten(flat, d):
    return [[flat[i * d + j] for j in range(d)] for i in range(d)]


def _logm_kernel(d, order, db_tol, mat_ref, out_ref):
    A = [[mat_ref[i * d + j] for j in range(d)] for i in range(d)]
    one = jnp.ones_like(A[0][0])
    zero = jnp.zeros_like(A[0][0])
    eye = [[one if i == j else zero for j in range(d)] for i in range(d)]

    def dist2(G):
        acc = None
        for i in range(d):
            for j in range(d):
                dv = G[i][j] - eye[i][j]
                t = dv * dv
                acc = t if acc is None else acc + t
        return acc

    def any_active(d2, tol2):
        # block-global test that excludes non-finite lanes: one
        # divergent matrix (negative real eigenvalues -> NaN) must not
        # freeze or early-exit the whole block
        return jnp.any(jnp.where(jnp.isfinite(d2), d2, 0.0) > tol2)

    # Both loops below are while_loops with block-global convergence
    # tests (M -> I quadratically): typical inputs exit after ~5-7
    # iterations instead of always paying the cap — measured 2.6x on
    # v5e at 1M 4x4. The caps only bound the worst case.
    def sqrt_db(G):
        # product form with the cancellation-free M-update
        # ``M <- 1/4 M^-1 (M + I)^2``. Deliberately UNSCALED: on-cut
        # eigenvalues must diverge to NaN (the rescue signal), not be
        # silently converged to a non-principal branch (see
        # ``ops.lie._sqrtm_db``)
        def cond(carry):
            M = _unflatten(carry[0], d)
            return (carry[2] < _DB_ITERS) & any_active(
                dist2(M), db_tol * db_tol
            )

        def body(carry):
            M = _unflatten(carry[0], d)
            Y = _unflatten(carry[1], d)
            Minv = _inv_grid(M, d)
            T = [
                [M[i][j] + eye[i][j] for j in range(d)]
                for i in range(d)
            ]
            Yn = [[v * 0.5 for v in row] for row in _mm_grid(
                _mm_grid(Y, Minv, d), T, d)]
            Mn = [[v * 0.25 for v in row] for row in _mm_grid(
                Minv, _mm_grid(T, T, d), d)]
            return _flatten(Mn, d), _flatten(Yn, d), carry[2] + 1

        carry = jax.lax.while_loop(
            cond, body,
            (_flatten(G, d), _flatten(G, d), jnp.int32(0)),
        )
        # per-lane convergence: a lane that hit the cap mid-air must
        # not be mistaken for a square root (on-cut eigenvalues bounce
        # forever) — NaN it so the ISS flags it instead of re-sqrt-ing
        # garbage that could land near I on a wrong branch
        Mf = _unflatten(carry[0], d)
        d2 = dist2(Mf)
        conv = jnp.isfinite(d2) & (d2 <= (8 * db_tol) ** 2)
        Yf = _unflatten(carry[1], d)
        return [
            [jnp.where(conv, Yf[i][j], jnp.nan) for j in range(d)]
            for i in range(d)
        ]

    def iss_cond(carry):
        Af = _unflatten(carry[0], d)
        return (carry[3] < _ISS_MAX) & any_active(
            dist2(Af), _THRESH * _THRESH
        )

    def iss_body(carry):
        Af = _unflatten(carry[0], d)
        Df = _unflatten(carry[1], d)
        k = carry[2]
        d2 = dist2(Af)
        need = jnp.isfinite(d2) & (d2 > _THRESH * _THRESH)
        As = sqrt_db(Af)
        # cancellation-free difference tracking (Al-Mohy & Higham
        # 2012 recurrence): A_k - I = (A_{k-1} - I)(A_k + I)^{-1} —
        # subtracting I from the computed A_k ~ I + X/2^k would lose
        # ~k + log2(1/||X||) bits (the round-2 f32 tail, VERDICT #9)
        AsI = [
            [As[i][j] + eye[i][j] for j in range(d)] for i in range(d)
        ]
        Ds = _mm_grid(Df, _inv_grid(AsI, d), d)
        An = [
            [jnp.where(need, As[i][j], Af[i][j]) for j in range(d)]
            for i in range(d)
        ]
        Dn = [
            [jnp.where(need, Ds[i][j], Df[i][j]) for j in range(d)]
            for i in range(d)
        ]
        return (_flatten(An, d), _flatten(Dn, d),
                k + need.astype(k.dtype), carry[3] + 1)

    k0 = jnp.zeros_like(A[0][0])
    D0 = [[A[i][j] - eye[i][j] for j in range(d)] for i in range(d)]
    flat, dflat, k, _ = jax.lax.while_loop(
        iss_cond, iss_body,
        (_flatten(A, d), _flatten(D0, d), k0, jnp.int32(0)),
    )
    A = _unflatten(flat, d)
    Am = _unflatten(dflat, d)  # accurately-tracked A - I
    # flag lanes whose square-root chain never reached the series
    # region (eigenvalues on the negative real axis): NaN them so the
    # public op can reroute exactly those through its exceptional path
    d2 = dist2(A)
    bad = ~(jnp.isfinite(d2) & (d2 <= _THRESH * _THRESH))

    # log(A) = 2 atanh(Z), Z = (A - I)(A + I)^{-1}; Gregory series
    Ap = [[A[i][j] + eye[i][j] for j in range(d)] for i in range(d)]
    Z = _mm_grid(Am, _inv_grid(Ap, d), d)
    Z2 = _mm_grid(Z, Z, d)
    acc = [[eye[i][j] / order for j in range(d)] for i in range(d)]
    for m in range(order - 2, 0, -2):
        P = _mm_grid(Z2, acc, d)
        acc = [[eye[i][j] / m + P[i][j] for j in range(d)] for i in range(d)]
    L = _mm_grid(Z, acc, d)
    scale = jnp.where(bad, jnp.nan, 2.0 * jnp.exp2(k))
    for i in range(d):
        for j in range(d):
            out_ref[i * d + j] = L[i][j] * scale


def _logm_rolled_kernel(d, order, db_tol, mat_ref, out_ref):
    """Rolled (stacked-grid) inverse scaling-and-squaring for
    9 <= d <= 24: the same algebra as :func:`_logm_kernel` on
    ``(d, d, *lane)`` carries, with the register-grid inverses done by
    the rolled one-hot PLU (:func:`..kernels.sym_pallas._plu_rolled`)
    against an identity RHS — O(1) traced ops in d, where the unrolled
    form would need ~d^3 per matmul (minutes of Mosaic compile at
    d = 16)."""
    lane = mat_ref[0].shape
    dt = mat_ref[0].dtype
    A0 = jnp.stack([mat_ref[r] for r in range(d * d)],
                   axis=0).reshape((d, d) + lane)
    eye = _eye_st(d, lane, dt)

    def dist2(G):
        return jnp.sum((G - eye) ** 2, axis=(0, 1))

    def any_active(d2, tol2):
        return jnp.any(jnp.where(jnp.isfinite(d2), d2, 0.0) > tol2)

    def inv_st(M):
        U, R, _ = _plu_rolled(M, eye)
        return _plu_rolled_backsub(U, R)

    def sqrt_db(G):
        # product-form Denman-Beavers, unscaled (divergence = the
        # branch-cut signal) — see _logm_kernel for the rationale
        def cond(carry):
            return (carry[2] < _DB_ITERS) & any_active(
                dist2(carry[0]), db_tol * db_tol
            )

        def body(carry):
            M, Y, it = carry
            Minv = inv_st(M)
            T = M + eye
            Yn = 0.5 * _mm_st(_mm_st(Y, Minv, d), T, d)
            Mn = 0.25 * _mm_st(Minv, _mm_st(T, T, d), d)
            return Mn, Yn, it + 1

        Mf, Yf, _ = jax.lax.while_loop(cond, body, (G, G, jnp.int32(0)))
        d2 = dist2(Mf)
        conv = (jnp.isfinite(d2) & (d2 <= (8 * db_tol) ** 2))[None, None]
        return jnp.where(conv, Yf, jnp.nan)

    def iss_cond(carry):
        return (carry[3] < _ISS_MAX) & any_active(
            dist2(carry[0]), _THRESH * _THRESH
        )

    def iss_body(carry):
        Af, Df, k, it = carry
        d2 = dist2(Af)
        need = jnp.isfinite(d2) & (d2 > _THRESH * _THRESH)
        As = sqrt_db(Af)
        # cancellation-free A - I tracking (Al-Mohy & Higham 2012):
        # D_k = D_{k-1} (A_k + I)^{-1}
        Ds = _mm_st(Df, inv_st(As + eye), d)
        nb = need[None, None]
        return (jnp.where(nb, As, Af), jnp.where(nb, Ds, Df),
                k + need.astype(k.dtype), it + 1)

    k0 = jnp.zeros(lane, dt)
    A, Am, k, _ = jax.lax.while_loop(
        iss_cond, iss_body, (A0, A0 - eye, k0, jnp.int32(0)))
    d2 = dist2(A)
    bad = ~(jnp.isfinite(d2) & (d2 <= _THRESH * _THRESH))

    # log(A) = 2 atanh(Z), Z = (A - I)(A + I)^{-1}; Gregory series
    Z = _mm_st(Am, inv_st(A + eye), d)
    Z2 = _mm_st(Z, Z, d)
    acc = eye / order
    for m in range(order - 2, 0, -2):
        acc = eye / m + _mm_st(Z2, acc, d)
    L = _mm_st(Z, acc, d)
    scale = jnp.where(bad, jnp.nan, 2.0 * jnp.exp2(k))[None, None]
    L = L * scale
    for i in range(d):
        for j in range(d):
            out_ref[i * d + j] = L[i, j]


def _logm_flat_kernel(d, order, db_tol, mat_ref, out_ref):
    """Flat-loop inverse scaling-and-squaring for 24 < d <= 32.

    Same algebra as :func:`_logm_rolled_kernel` but restructured as ONE
    ``lax.while_loop`` whose body is a single Denman-Beavers step plus a
    *masked commit*: when the current square-root run converges
    (block-global test, same semantics as the nested form's inner
    while), the lanes still above the series threshold commit
    ``A <- sqrt(A)``, update the cancellation-free ``A - I`` track
    ``D <- D (A_s + I)^{-1}`` (Al-Mohy & Higham 2012), bump their
    square-root count, and the DB state resets to the new ``A``. The
    commit inverse is paid every iteration (masked out when not
    committing) — ~1.5x the nested body's work — but the kernel's
    loop nesting drops from while(while(fori)) to while(fori), which
    is what keeps the Mosaic compile tractable at d = 32 (the nested
    form was killed at >27 min; flat-loop kernels of this size compile
    in ~1-3 min — CLAUDE.md round-3 findings). Reference analog:
    ``_impl/logm.py:102-126`` (scipy per-matrix, uncapped d).
    """
    lane = mat_ref[0].shape
    dt = mat_ref[0].dtype
    A0 = jnp.stack([mat_ref[r] for r in range(d * d)],
                   axis=0).reshape((d, d) + lane)
    eye = _eye_st(d, lane, dt)

    def dist2(G):
        return jnp.sum((G - eye) ** 2, axis=(0, 1))

    def any_active(d2, tol2):
        return jnp.any(jnp.where(jnp.isfinite(d2), d2, 0.0) > tol2)

    def inv_st(M):
        U, R, _ = _plu_rolled(M, eye)
        return _plu_rolled_backsub(U, R)

    thresh2 = _THRESH * _THRESH
    tol2 = db_tol * db_tol

    def cond(c):
        return (c[6] < _ISS_MAX * _DB_ITERS) & any_active(
            dist2(c[0]), thresh2
        )

    def body(c):
        A, D, M, Y, k, db_it, tot = c
        # one product-form DB step (unscaled: divergence to NaN is the
        # branch-cut signal, as in the nested kernels)
        Minv = inv_st(M)
        T = M + eye
        Yn = 0.5 * _mm_st(_mm_st(Y, Minv, d), T, d)
        Mn = 0.25 * _mm_st(Minv, _mm_st(T, T, d), d)
        db_it = db_it + 1
        d2m = dist2(Mn)
        db_done = (~any_active(d2m, tol2)) | (db_it >= _DB_ITERS)
        # per-lane sqrt validity: cap-expired lanes must come back NaN
        # (on-cut eigenvalues bounce forever — same contract as nested)
        conv = jnp.isfinite(d2m) & (d2m <= (8 * db_tol) ** 2)
        Ys = jnp.where(conv[None, None], Yn, jnp.nan)
        d2a = dist2(A)
        need = jnp.isfinite(d2a) & (d2a > thresh2)
        commit = db_done & need
        cb = commit[None, None]
        # masked commit work — computed every iteration, used only when
        # db_done (NaN lanes in Ys propagate NaN here and are masked)
        Dn = _mm_st(D, inv_st(Ys + eye), d)
        A2 = jnp.where(cb, Ys, A)
        D2 = jnp.where(cb, Dn, D)
        k2 = k + commit.astype(k.dtype)
        M2 = jnp.where(db_done, A2, Mn)
        Y2 = jnp.where(db_done, A2, Yn)
        db_it2 = jnp.where(db_done, jnp.int32(0), db_it)
        return A2, D2, M2, Y2, k2, db_it2, tot + jnp.int32(1)

    k0 = jnp.zeros(lane, dt)
    A, Am, _, _, k, _, _ = jax.lax.while_loop(
        cond, body,
        (A0, A0 - eye, A0, A0, k0, jnp.int32(0), jnp.int32(0)),
    )
    d2 = dist2(A)
    bad = ~(jnp.isfinite(d2) & (d2 <= thresh2))

    # log(A) = 2 atanh(Z), Z = (A - I)(A + I)^{-1}; Gregory series
    Z = _mm_st(Am, inv_st(A + eye), d)
    Z2 = _mm_st(Z, Z, d)
    acc = eye / order
    for m in range(order - 2, 0, -2):
        acc = eye / m + _mm_st(Z2, acc, d)
    L = _mm_st(Z, acc, d)
    scale = jnp.where(bad, jnp.nan, 2.0 * jnp.exp2(k))[None, None]
    L = L * scale
    for i in range(d):
        for j in range(d):
            out_ref[i * d + j] = L[i, j]


def logm_cf(
    mat: jnp.ndarray,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    """Channel-first batched matrix logarithm ``(d*d, ...) ->
    (d*d, ...)`` (Pallas; row-major channels, real d <= 32).

    One-memory-pass inverse scaling-and-squaring (see module
    docstring); d <= 8 unrolls the register grid per entry,
    9 <= d <= 24 runs the same algebra rolled on stacked
    ``(d, d, *lane)`` grids with rolled-PLU inverses
    (:func:`_logm_rolled_kernel`), and 24 < d <= 32 uses the flat
    single-while restructuring (:func:`_logm_flat_kernel`) whose
    Mosaic compile stays tractable. Forward-only — for gradients use
    :func:`fastmath_tpu.ops.lie.logm`, whose Mathias VJP wraps this
    kernel's forward on TPU. Real inputs whose principal log is
    complex yield NaNs (same divergence contract as ``lie.logm``).
    """
    mat = jnp.asarray(mat)
    d = int(round(np.sqrt(mat.shape[0])))
    if d * d != mat.shape[0] or d > _MAX_D_FLAT:
        raise ValueError(
            f"logm_cf expects (d*d, ...) rows with d <= {_MAX_D_FLAT}; "
            f"got {mat.shape[0]} channels"
        )
    if block is None:
        # ~9 live d x d register grids (A, D, M, Y, inverse scratch,
        # Gregory accumulators): shrink the lane block as d grows
        # (1024 is the stacked-grid minimum for the rolled tier)
        block = 8192 if d <= 4 else (2048 if d <= 8 else 1024)
    if not jnp.issubdtype(mat.dtype, jnp.floating):
        mat = mat.astype(jnp.result_type(float))
    if interpret is None:
        interpret = _interpret_default()
    if d > _MAX_D and not interpret:
        # stacked-grid sublane rule on real TPU (interpret mode has no
        # such constraint)
        block = _sublane_block(block)
    order = 21 if jnp.finfo(mat.dtype).eps < 1e-10 else 9
    db_tol = float(jnp.finfo(mat.dtype).eps) * 8 * d
    batch_shape = mat.shape[1:]
    m2 = mat.reshape(mat.shape[0], -1)
    if d <= _MAX_D:
        body = _logm_kernel
    elif d <= _MAX_D_ROLLED:
        body = _logm_rolled_kernel
    else:
        # 24 < d <= 32: the nested while(while(fori)) form's Mosaic
        # compile explodes (>27 min at d=32, killed); the flat
        # single-while restructuring compiles like the expm/PLU flat
        # kernels and pays ~1.5x per-iteration work (masked commit
        # inverse) for it — still ~10x+ the XLA ISS tier on hardware.
        body = _logm_flat_kernel
    kern = functools.partial(body, d, order, db_tol)
    # The rolled tier's live stacked grids (A, D, M, Y, PLU scratch,
    # Gregory accumulators) total ~17 MiB at d=16 x block 1024 — over
    # Mosaic's 16 MiB default scoped-VMEM stack (measured OOM by
    # 864 KiB on v5e). Raise the limit; block 1024 is already the
    # stacked-grid minimum so it cannot shrink instead.
    # ~17 MiB of live grids at d=16 scales ~d^2: 32 MiB serves
    # 9 <= d <= 16, 64 MiB to d=24; the flat tier's extra commit
    # grids at d <= 32 need ~96 MiB (v5e has 128 MiB physical VMEM).
    if d > _MAX_D_ROLLED:
        vmem_limit = 100 * 1024 * 1024
    elif d > 16:
        vmem_limit = 64 * 1024 * 1024
    elif d > _MAX_D:
        vmem_limit = 32 * 1024 * 1024
    else:
        vmem_limit = None
    out = _call_rows(kern, (m2,), mat.shape[0], block, bool(interpret),
                     diag_rows=tuple(i * d + i for i in range(d)),
                     bm=bm, vmem_limit=vmem_limit)
    return out.reshape(mat.shape[0], *batch_shape)
