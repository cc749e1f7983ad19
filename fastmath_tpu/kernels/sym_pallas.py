"""Pallas TPU kernels for compact-symmetric ops — the ``jitfields``
replacement (reference ``sym.py:37``, external C++/CUDA kernels).

Layout: these kernels run on **channel-first (SoA) storage** —
``mat (NN, B)``, ``vec (N, B)`` — the TPU-native layout for this
workload: the batch axis rides the 128-wide lane dimension, every
coefficient stream is a contiguous HBM row, and Pallas's grid pipeline
double-buffers blocks of lanes through VMEM at full HBM bandwidth. The
reference/API layout (``(..., NN)``, channel-minor) puts a size-10 axis
in the lane dimension, which wastes most of each memory transaction —
that layout is served by the fused-XLA closed forms in
:mod:`fastmath_tpu.ops.sym` instead.

The per-element math is *generated from the same trace-time adjugate
machinery* as the XLA path (:func:`fastmath_tpu.ops.sym._adjugate_apply`),
so the two paths are numerically identical modulo instruction order.

Autodiff: each kernel wrapper defines a ``custom_vjp`` whose backward
pass is itself expressed with the same kernels (e.g. the solve VJP is
two solves plus a compact outer product), mirroring how jitfields'
kernels would have been differentiated by hand.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.dtypes import downcast as _downcast, upcast_half
from ..layouts.sym import compact_size, sym_dim, tri_index
from ..ops.sym import _adjugate_apply, _det_expand

__all__ = [
    "sym_solve_cf",
    "sym_solve_chain_cf",
    "sym_matvec_chain_cf",
    "sym_maxeig_cf",
    "sym_matvec_cf",
    "sym_invert_cf",
    "sym_addmatvec_cf",
    "sym_submatvec_cf",
    "sym_outer_cf",
    "sym_det_cf",
    "DEFAULT_BLOCK",
]

DEFAULT_BLOCK = 8192  # lanes per grid step (multiple of 128)

#: Largest N served by the unrolled Pallas tier (adjugate closed forms
#: N <= 4, in-register unrolled pivoted LU 5 <= N <= 8 — jitfields'
#: kernels had no N cap, reference ``sym.py:16-24``).
MAX_N = 8
#: solve/invert/det extend to N <= 32 via the fori_loop-rolled one-hot
#: PLU on stacked grids (``_plu_rolled`` — O(1) compile in N; N <= 16
#: is the BASELINE gate, 17..32 removes the cap the reference's
#: jitfields kernels never had). Above 16 the live stacked grids
#: (n^2 x block x 4 B each) outgrow Mosaic's 16 MiB default
#: scoped-VMEM stack, so those paths pass ``_rolled_vmem(n)``.
MAX_N_ROLLED = 32


def _rolled_vmem(n: int):
    """Scoped-VMEM request for rolled stacked-grid kernels: None keeps
    Mosaic's 16 MiB default (enough through n = 16); n > 16 requests
    64 MiB (a 32x32 grid is 4 MiB at block 1024 and solve/inv/eig hold
    ~3-5 of them live; v5e has 128 MiB physical VMEM)."""
    return 64 * 1024 * 1024 if n > 16 else None


def _sublane_block(block: int) -> int:
    """Clamp a caller block size to the stacked-grid sublane rule: the
    Mosaic block layout needs ``bb = block / 128`` to be a multiple of
    8, i.e. ``block`` a multiple of 1024 (and >= 1024). Shared by every
    rolled stacked-grid kernel (PLU/chol/JhJ here, eig/expm/logm in
    their modules)."""
    return max(1024, (block // 1024) * 1024)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _default_block(n: int, block, bm: bool = False) -> int:
    """Shrink the lane block as N grows: the PLU path keeps ~2 full
    register grids (n^2 rows each) live per lane, and scoped VMEM is
    ~16 MB (block x rows x 4 B x double-buffer must fit).

    The block-major grid (``bm``) reads contiguous slabs, so larger
    blocks amortize better before VMEM binds (measured on v5e:
    6x6 solve 5.7e8/s at 16384 vs 5.0e8 at 4096; 8x8 peaks at 4096)."""
    if block is not None:
        return block
    if bm:
        if n > 8:
            return 1024
        return 16384 if n <= 6 else 4096
    if n <= 4:
        return DEFAULT_BLOCK
    if n > 8:
        return 1024
    return 4096 if n <= 6 else 2048


def _pad_to_block(arrs, block, diag_rows=0):
    """Pad the lane axis up to a block multiple. ``diag_rows`` selects
    rows of the first array that hold the matrix diagonal — an int
    means the first k rows (compact-symmetric layout), a tuple lists
    explicit row indices (row-major full layout). Those rows pad with
    1.0 so padded lanes hold the identity — keeps the padded region's
    solve/inverse/cholesky finite (no spurious NaNs under debug_nans)."""
    b = arrs[0].shape[-1]
    pad = (-b) % block
    if pad:
        if isinstance(diag_rows, int):
            diag_rows = tuple(range(diag_rows))
        padded = []
        for idx, a in enumerate(arrs):
            p = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
            if idx == 0 and diag_rows:
                p = p.at[jnp.asarray(diag_rows), b:].set(1.0)
            padded.append(p)
        arrs = padded
    return arrs, b


def _entries_rows(mat_ref_or_arr, n):
    """Entry grid E[i][j] over the leading (channel) axis."""
    return [
        [mat_ref_or_arr[tri_index(i, j, n)] for j in range(n)]
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# kernel bodies (shared structure: rows = channels, lanes = batch)
# ---------------------------------------------------------------------------


def _plu_grid(E, R, n, record=False):
    """In-register unrolled LU with partial pivoting on an entry grid
    (lists of lane vectors), eliminating the RHS rows ``R`` in place.

    The per-lane dynamic pivot choice is expressed with one-hot masks
    (first-max tie-break) and ``jnp.where`` row swaps — no gathers, so
    the whole factorization stays lane-parallel VPU work (the register
    analog of ``ops.batched._plu_unrolled``). ``E`` and ``R`` are
    mutated; afterwards ``E`` holds U on/above the diagonal. Returns
    the permutation parity per lane (used by the determinant kernels).

    ``record=True`` produces a reusable packed factorization: the L
    multipliers are stored below the diagonal of ``E`` (later row
    swaps permute them along, as in standard packed PLU) and the
    per-step one-hot pivot masks are returned as well —
    ``(parity, pivs)`` — so :func:`_plu_substitute` can apply
    ``P A = L U`` to fresh right-hand sides (factor once, solve many).
    """
    parity = None
    pivs = []
    for k in range(n):
        if k < n - 1:
            m = jnp.abs(E[k][k])
            for i in range(k + 1, n):
                m = jnp.maximum(m, jnp.abs(E[i][k]))
            taken = None
            piv = []  # one-hot masks over rows k..n-1
            for i in range(k, n):
                hit = jnp.abs(E[i][k]) == m
                if taken is not None:
                    hit = hit & ~taken
                taken = hit if taken is None else taken | hit
                piv.append(hit)
            flip = jnp.where(piv[0], 1.0, -1.0)
            parity = flip if parity is None else parity * flip
            old_k = E[k][:]
            old_kr = R[k][:]
            # pivot row -> row k
            for j in range(n):
                acc = E[k][j]
                for i in range(k + 1, n):
                    acc = jnp.where(piv[i - k], E[i][j], acc)
                E[k][j] = acc
            for c in range(len(R[k])):
                acc = R[k][c]
                for i in range(k + 1, n):
                    acc = jnp.where(piv[i - k], R[i][c], acc)
                R[k][c] = acc
            # old row k -> the pivot's slot
            for i in range(k + 1, n):
                for j in range(n):
                    E[i][j] = jnp.where(piv[i - k], old_k[j], E[i][j])
                for c in range(len(R[i])):
                    R[i][c] = jnp.where(piv[i - k], old_kr[c], R[i][c])
            if record:
                pivs.append(piv)
        inv_p = 1.0 / E[k][k]
        for i in range(k + 1, n):
            l = E[i][k] * inv_p
            if record:
                E[i][k] = l
            for j in range(k + 1, n):
                E[i][j] = E[i][j] - l * E[k][j]
            for c in range(len(R[i])):
                R[i][c] = R[i][c] - l * R[k][c]
    if parity is None:
        parity = jnp.ones_like(E[0][0])
    return (parity, pivs) if record else parity


def _plu_rolled(A, R=None):
    """Rolled (``lax.fori_loop``) one-hot pivoted LU on **stacked**
    channel grids: ``A (n, n, *lane)`` and optional RHS
    ``R (n, k, *lane)``, batch on the trailing lane axes.

    Same algebra as :func:`_plu_grid` (one-hot first-max pivoting,
    scatter-free masked row swaps, lane-parallel elimination) but one
    traced step — compile time O(1) in n instead of O(n^3), which is
    what makes the 9 <= n <= 32 tier viable (the unrolled grid at
    n=16 is ~4k Mosaic ops). Returns ``(A, R, parity)`` with U on and
    above the diagonal of ``A``.
    """
    n = A.shape[0]
    lane = A.shape[2:]
    dt = A.dtype
    # one-hot masked indexing throughout: Mosaic has no dynamic_slice
    # lowering inside TPU kernels, so "row k" / "column k" are masked
    # reductions over the stacked grid (one extra full-grid pass each —
    # same O(n^2)-per-step complexity as the rank-1 update itself)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * len(lane), 0)
    cols1 = rows1
    parity = jnp.ones(lane, dt)
    no_rhs = R is None
    # Mosaic rejects zero-sized vector carries — carry a 1-wide dummy
    # RHS when there is none (negligible: one extra lane column)
    Rz = jnp.zeros((n, 1) + lane, dt) if no_rhs else R
    neg = jnp.asarray(-jnp.inf, dt)

    def step(k, carry):
        A, R, parity = carry
        ek_r = (rows1 == k).astype(dt)  # one-hot row selector (n, *1)
        colk = jnp.sum(A * ek_r[None, :], axis=1)  # A[:, k]  (n, *lane)
        mag = jnp.where(rows1 >= k, jnp.abs(colk), neg)
        hit = mag == jnp.max(mag, axis=0, keepdims=True)
        # first-max tie-break as a static prefix scan over the stacked
        # axis (n is static; Mosaic has no cumsum lowering)
        taken = hit[0]
        piv_rows = [hit[0]]
        for i in range(1, n):
            h = hit[i] & ~taken
            piv_rows.append(h)
            taken = taken | h
        pivf = jnp.stack(piv_rows, axis=0).astype(dt)
        stay = jnp.sum(pivf * ek_r, axis=0)
        parity = parity * jnp.where(stay > 0, dt.type(1), dt.type(-1))
        # scatter-free swap: A += (e_k - o_p) (x) (row_p - row_k)
        rowk = jnp.sum(A * ek_r[:, None], axis=0)  # A[k, :]  (n, *lane)
        rowp = jnp.sum(pivf[:, None] * A, axis=0)
        A = A + (ek_r - pivf)[:, None] * (rowp - rowk)[None, :]
        if R.shape[1]:
            rk = jnp.sum(R * ek_r[:, None], axis=0)
            rp = jnp.sum(pivf[:, None] * R, axis=0)
            R = R + (ek_r - pivf)[:, None] * (rp - rk)[None, :]
        # elimination of rows below k (l masked to 0 elsewhere)
        rowk = jnp.sum(A * ek_r[:, None], axis=0)
        pv = jnp.sum(rowk * (cols1 == k).astype(dt), axis=0)
        colk = jnp.sum(A * ek_r[None, :], axis=1)
        l = jnp.where(rows1 > k, colk / pv, jnp.zeros_like(colk))
        A = A - l[:, None] * rowk[None, :]
        if R.shape[1]:
            rk2 = jnp.sum(R * ek_r[:, None], axis=0)
            R = R - l[:, None] * rk2[None, :]
        return A, R, parity

    A, Rz, parity = jax.lax.fori_loop(0, n, step, (A, Rz, parity))
    return A, (None if no_rhs else Rz), parity


def _plu_rolled_backsub(U, R):
    """Rolled back-substitution ``U x = r`` for the stacked grids of
    :func:`_plu_rolled`: ``U (n, n, *lane)`` upper-triangular,
    ``R (n, k, *lane)`` forward-eliminated RHS; returns ``X`` of R's
    shape. Row i of the carry holds the solution for rows > i and the
    eliminated RHS below."""
    n = U.shape[0]
    lane = U.shape[2:]
    dt = U.dtype
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * len(lane), 0)

    def bstep(t, X):
        i = n - 1 - t
        ei = (rows1 == i).astype(dt)
        rowi = jnp.sum(U * ei[:, None], axis=0)  # U[i, :]
        uii = jnp.sum(rowi * ei, axis=0)
        masked = jnp.where(rows1 > i, rowi, jnp.zeros_like(rowi))
        s = jnp.sum(masked[:, None] * X, axis=0)
        ri = jnp.sum(X * ei[:, None], axis=0)
        xi = (ri - s) / uii
        # masked write of row i
        return X + ei[:, None] * (xi - ri)[None, :]

    return jax.lax.fori_loop(0, n, bstep, R)


def _chol_rolled(A):
    """Rolled (``lax.fori_loop``) right-looking outer-product Cholesky
    on a stacked channel grid ``A (n, n, *lane)``; returns the lower
    factor ``L (n, n, *lane)`` with exact zeros above the diagonal.

    Same one-hot masked-indexing idiom as :func:`_plu_rolled` (Mosaic
    has no dynamic_slice lowering in TPU kernels): step k reads column
    k of the running Schur complement with a masked reduction, scales
    rows >= k by ``rsqrt`` of the pivot, subtracts the rank-1 trailing
    update restricted to rows/cols > k, and mask-writes column k of L.
    No pivoting (SPD input contract, like the unrolled
    ``_chol_rows``). O(1) traced ops per step -> O(1) Mosaic compile
    in n; serves 9 <= n <= 32 where the per-entry unrolled grid would
    cost ~n^3 register ops."""
    n = A.shape[0]
    lane = A.shape[2:]
    dt = A.dtype
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * len(lane), 0)

    def step(k, carry):
        W, L = carry
        ek = (rows1 == k).astype(dt)
        colk = jnp.sum(W * ek[None, :], axis=1)  # W[:, k]  (n, *lane)
        dkk = jnp.sum(colk * ek, axis=0)  # pivot W[k, k]  (*lane)
        lk = jnp.where(rows1 >= k, colk * jax.lax.rsqrt(dkk),
                       jnp.zeros_like(colk))
        below = jnp.where(rows1 > k, lk, jnp.zeros_like(lk))
        W = W - below[:, None] * below[None, :]
        L = L + lk[:, None] * ek[None, :]
        return W, L

    _, L = jax.lax.fori_loop(0, n, step, (A, jnp.zeros_like(A)))
    return L


def _plu_substitute(E, pivs, r, n, inv_diag=None):
    """Solve ``A x = r`` from a recorded packed factorization
    (``_plu_grid(..., record=True)``): apply the one-hot row swaps and
    the stored L multipliers forward, then back-substitute with U.
    ``r`` is a list of n lane vectors (not mutated); ``inv_diag`` may
    pass precomputed ``1/U[i][i]`` rows (loop-invariant across chained
    solves). O(n^2) VPU work per solve vs O(n^3/3) for refactoring."""
    r = list(r)
    for k in range(n - 1):
        piv = pivs[k]
        old_k = r[k]
        acc = r[k]
        for i in range(k + 1, n):
            acc = jnp.where(piv[i - k], r[i], acc)
        r[k] = acc
        for i in range(k + 1, n):
            r[i] = jnp.where(piv[i - k], old_k, r[i])
        for i in range(k + 1, n):
            r[i] = r[i] - E[i][k] * r[k]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        acc = r[i]
        for j in range(i + 1, n):
            acc = acc - E[i][j] * x[j]
        x[i] = acc * inv_diag[i] if inv_diag is not None else acc / E[i][i]
    return x


def _plu_grid_solve(E, rhs_cols, n):
    """Unrolled PLU solve of ``E x = rhs`` for a list of RHS columns
    (each a list of n lane vectors). Returns the solution columns.
    Copies its inputs (callers keep the original grid for refinement)."""
    E = [row[:] for row in E]
    R = [[col[i] for col in rhs_cols] for i in range(n)]
    _plu_grid(E, R, n)
    ncols = len(rhs_cols)
    X = [[None] * ncols for _ in range(n)]
    for i in range(n - 1, -1, -1):
        inv_d = 1.0 / E[i][i]
        for c in range(ncols):
            acc = R[i][c]
            for j in range(i + 1, n):
                acc = acc - E[i][j] * X[j][c]
            X[i][c] = acc * inv_d
    return [[X[i][c] for i in range(n)] for c in range(ncols)]


def _solve_kernel(n, eps_vec, refine, mat_ref, vec_ref, out_ref):
    E = _entries_rows(mat_ref, n)
    if eps_vec is not None:
        for i in range(n):
            E[i][i] = E[i][i] + eps_vec[i]
    v = [vec_ref[j] for j in range(n)]
    if n == 1:
        x = v[0] / E[0][0]
        out_ref[0] = x
        return

    if n > 8:
        # fori_loop-rolled one-hot PLU on stacked grids (O(1) compile)
        lane = E[0][0].shape
        A = jnp.stack([E[i][j] for i in range(n) for j in range(n)],
                      axis=0).reshape((n, n) + lane)
        vst = jnp.stack(v, axis=0)
        if refine:
            # factor ONCE against [v | I]: the identity columns cost
            # ~one extra factorization-equivalent of elimination but
            # buy an explicit inverse, so every refinement step is one
            # O(n^2) masked matvec instead of a fresh O(n^3)
            # refactorization of the unchanged A
            ri = jax.lax.broadcasted_iota(
                jnp.int32, (n, n) + (1,) * len(lane), 0)
            ci = jax.lax.broadcasted_iota(
                jnp.int32, (n, n) + (1,) * len(lane), 1)
            eye = jnp.broadcast_to((ri == ci).astype(A.dtype),
                                   (n, n) + lane)
            R = jnp.concatenate([vst.reshape((n, 1) + lane), eye], axis=1)
            U, Rf, _ = _plu_rolled(A, R)
            X = _plu_rolled_backsub(U, Rf)
            x = [X[i, 0] for i in range(n)]
            Inv = X[:, 1:]
            for _ in range(refine):
                r = []
                for i in range(n):
                    acc = v[i] - E[i][i] * x[i]
                    for j in range(n):
                        if j != i:
                            acc = acc - E[i][j] * x[j]
                    r.append(acc)
                rst = jnp.stack(r, axis=0)
                dx = jnp.sum(Inv * rst[None, :], axis=1)
                x = [xi + dx[i] for i, xi in enumerate(x)]
        else:
            U, Rf, _ = _plu_rolled(A, vst.reshape((n, 1) + lane))
            X = _plu_rolled_backsub(U, Rf)
            x = [X[i, 0] for i in range(n)]
        for i in range(n):
            out_ref[i] = x[i]
        return

    if n > 4:
        # unrolled pivoted LU (adjugate expansion explodes beyond 4)
        (x,) = _plu_grid_solve(E, [v], n)
        # refinement re-solves the residual from scratch — still worth
        # it on a memory-bound kernel when requested, but default 0
        # here (PLU with partial pivoting is already backward stable)
        for _ in range(refine):
            r = []
            for i in range(n):
                acc = v[i] - E[i][i] * x[i]
                for j in range(n):
                    if j != i:
                        acc = acc - E[i][j] * x[j]
                r.append(acc)
            (dx,) = _plu_grid_solve(E, [r], n)
            x = [xi + d for xi, d in zip(x, dx)]
        for i in range(n):
            out_ref[i] = x[i]
        return

    out, det = _adjugate_apply(E, v, n)
    inv_det = 1.0 / det
    x = [o * inv_det for o in out]
    # iterative refinement: x += A^{-1} (v - A x). The operands are
    # already in VMEM/registers, so each step is pure VPU work — free on
    # this memory-bound kernel — and sharpens the fp32 conditioning tail.
    for _ in range(refine):
        r = []
        for i in range(n):
            acc = v[i] - E[i][i] * x[i]
            for j in range(n):
                if j != i:
                    acc = acc - E[i][j] * x[j]
            r.append(acc)
        dx, _ = _adjugate_apply(E, r, n)
        x = [xi + d * inv_det for xi, d in zip(x, dx)]
    for i in range(n):
        out_ref[i] = x[i]


def _matvec_kernel(n, mat_ref, vec_ref, out_ref):
    v = [vec_ref[j] for j in range(n)]
    for i in range(n):
        acc = mat_ref[i] * v[i]
        for j in range(n):
            if j != i:
                acc = acc + mat_ref[tri_index(i, j, n)] * v[j]
        out_ref[i] = acc


def _invert_kernel(n, mat_ref, out_ref):
    from ..ops.sym import _det_expand

    E = _entries_rows(mat_ref, n)
    if n > 8:
        lane = E[0][0].shape
        A = jnp.stack([E[i][j] for i in range(n) for j in range(n)],
                      axis=0).reshape((n, n) + lane)
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, n) + (1,) * len(lane),
                                      0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (n, n) + (1,) * len(lane),
                                      1)
        eye = jnp.broadcast_to((ri == ci).astype(A.dtype), (n, n) + lane)
        U, R, _ = _plu_rolled(A, eye)
        X = _plu_rolled_backsub(U, R)  # X[i, c] = inv[i][c]
        for i in range(n):
            out_ref[i] = X[i, i]
        for i in range(n):
            for j in range(i + 1, n):
                out_ref[tri_index(i, j, n)] = 0.5 * (X[i, j] + X[j, i])
        return
    if n > 4:
        # unrolled pivoted LU against the n identity columns; the
        # result is symmetrized into compact storage (the exact inverse
        # is symmetric; averaging (i,j)/(j,i) removes roundoff skew)
        one = jnp.ones_like(E[0][0])
        zero = jnp.zeros_like(E[0][0])
        eye_cols = [
            [one if i == c else zero for i in range(n)] for c in range(n)
        ]
        X = _plu_grid_solve(E, eye_cols, n)  # X[c][i] = inv[i][c]
        for i in range(n):
            out_ref[i] = X[i][i]
        for i in range(n):
            for j in range(i + 1, n):
                out_ref[tri_index(i, j, n)] = 0.5 * (X[j][i] + X[i][j])
        return
    idx = tuple(range(n))
    cache = {}
    det = _det_expand(E, idx, idx, cache)
    inv_det = 1.0 / det
    c = n
    for i in range(n):
        for j in range(i, n):
            rows = tuple(r for r in idx if r != j)
            cols = tuple(cc for cc in idx if cc != i)
            minor = _det_expand(E, rows, cols, cache)
            cof = -minor if (i + j) % 2 else minor
            k = i if i == j else c
            if i != j:
                c += 1
            out_ref[k] = cof * inv_det


# ---------------------------------------------------------------------------
# pallas_call wrappers (channel-first 2-D operands)
# ---------------------------------------------------------------------------


class _Row4:
    """Adapter presenting a block-major 4-D ref ``(1, rows, bb, 128)``
    with the row-indexed interface the kernel bodies use (``ref[i]`` ->
    lane block ``(bb, 128)``), so one kernel body serves both grids."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, i):
        return self._ref[0, i]

    def __setitem__(self, i, v):
        self._ref[0, i] = v


def _call_rows(kernel, in_arrays, out_rows, block, interpret, diag_rows=0,
               bm=False, vmem_limit=None):
    """Run ``kernel`` over blocks of lanes: inputs ``(rows_i, B)`` ->
    output ``(out_rows, B)``.

    ``vmem_limit`` raises Mosaic's scoped-VMEM stack limit (bytes) above
    the conservative 16 MiB default — needed by rolled stacked-grid
    kernels whose live register grids scale as d^2 x block (e.g. logm
    d=16 holds ~17 MiB of A/D/M/Y/PLU/Gregory state at block 1024;
    measured OOM by 864 KiB on v5e, which has far more physical VMEM).

    Layout trick (``bm=False``, channel-first-resident data): each
    ``(rows, B)`` operand is viewed as ``(rows, B/128, 128)`` (a free
    row-major reshape) so the *tiled* trailing dims are exactly
    ``(B/128, 128)`` — zero sublane/lane padding in HBM and VMEM.
    Leaving the channel axis minor-most-2 (as ``(rows, B)``) would pad
    rows to the 8-sublane tile (10 -> 16, 4 -> 8) and waste ~40% of
    every transaction. Each grid step still issues one strided DMA per
    row (rows are B elements apart in HBM), which caps multi-row
    kernels at ~120-160 GB/s (CLAUDE.md, round-2 measurement).

    ``bm=True`` is the **block-major repack**: operands are physically
    rearranged to ``(nblocks, rows, bb, 128)`` so each grid step's
    entire input is one contiguous HBM slab (flat-DMA rate, ~2x the
    per-row strided rate for multi-row kernels). The repack itself is
    one fused XLA relayout pass; when the caller's data is batch-major
    ``(B, rows)`` (the public API layout) the lazy transpose it feeds
    us *composes* with the repack into a single block-local transpose
    — this is how the public ops route to the native tier without a
    separate global transpose (VERDICT r2 items 1/8).
    """
    block = max(128, (block // 128) * 128)
    extra = {}
    if vmem_limit is not None and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit))
    (padded, b) = _pad_to_block(list(in_arrays), block, diag_rows=diag_rows)
    bp = padded[0].shape[-1]
    nblocks = bp // block
    grid = (nblocks,)
    bb = block // 128
    if bm:
        padded = [
            a.reshape(a.shape[0], nblocks, bb, 128).transpose(1, 0, 2, 3)
            for a in padded
        ]
        in_specs = [
            pl.BlockSpec((1, a.shape[1], bb, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for a in padded
        ]
        wrapped = lambda *refs: kernel(*(_Row4(r) for r in refs))  # noqa: E731
        out = pl.pallas_call(
            wrapped,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, out_rows, bb, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblocks, out_rows, bb, 128),
                                           padded[0].dtype),
            interpret=interpret,
            **extra,
        )(*padded)
        out = out.transpose(1, 0, 2, 3).reshape(out_rows, bp)
        return out[:, :b]
    padded = [a.reshape(a.shape[0], bp // 128, 128) for a in padded]
    in_specs = [
        pl.BlockSpec((a.shape[0], bb, 128), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM)
        for a in padded
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_rows, bb, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, bp // 128, 128),
                                       padded[0].dtype),
        interpret=interpret,
        **extra,
    )(*padded)
    return out.reshape(out_rows, bp)[:, :b]


def _prep_eps(eps, n, dtype):
    if eps is None:
        return None
    e = np.asarray(eps, dtype=np.float64).ravel()
    if e.size < n:
        e = np.concatenate([e, np.full(n - e.size, e[-1])])
    return tuple(float(x) for x in e[:n])


# --- solve -----------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _solve_cf(mat, vec, eps_tuple, block, interpret, refine, bm=False):
    n = vec.shape[0]
    kern = functools.partial(_solve_kernel, n, eps_tuple, refine)
    return _call_rows(kern, (mat, vec), n, block, interpret, diag_rows=n,
                      bm=bm, vmem_limit=_rolled_vmem(n))


def _solve_cf_fwd(mat, vec, eps_tuple, block, interpret, refine, bm=False):
    x = _solve_cf(mat, vec, eps_tuple, block, interpret, refine, bm)
    return x, (mat, x)


def _solve_cf_bwd(eps_tuple, block, interpret, refine, bm, res, g):
    # x = A^{-1} v  =>  dv = A^{-1} g (A symmetric);  dA = -dv x^T,
    # compacted: diag_i = -dv_i x_i, offdiag (i<j) = -(dv_i x_j + dv_j x_i)
    mat, x = res
    n = x.shape[0]
    dv = _solve_cf(mat, g, eps_tuple, block, interpret, refine, bm)
    rows = [-dv[i] * x[i] for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            rows.append(-(dv[i] * x[j] + dv[j] * x[i]))
    dmat = jnp.stack(rows, axis=0)
    return dmat, dv


_solve_cf.defvjp(_solve_cf_fwd, _solve_cf_bwd)


def sym_solve_cf(
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    eps=None,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
    refine: Optional[int] = None,
    bm: bool = False,
) -> jnp.ndarray:
    r"""Channel-first compact-symmetric solve ``A \ v``:
    ``mat (NN, ...)``, ``vec (N, ...)`` -> ``(N, ...)``.

    The Pallas fast path for the north-star op (jitfields
    ``sym_solve``, reference ``sym.py:28-37``). Batch dims after the
    channel axis are flattened into lanes. N <= 4 solves with the
    trace-time adjugate; 5 <= N <= 8 with an in-register unrolled
    pivoted LU (jitfields' kernels had no N cap). ``refine`` adds
    in-register iterative-refinement steps (default 1 for N <= 4 —
    free on this memory-bound kernel, tightens the fp32 error tail on
    ill-conditioned matrices by ~1-2 digits — and 0 for the
    backward-stable LU path, where a step re-solves from scratch).
    """
    mat, vec, half = upcast_half(mat, vec)
    n = vec.shape[0]
    if mat.shape[0] != compact_size(n):
        raise ValueError(
            f"channel-first sym_solve expects mat ({compact_size(n)}, ...) "
            f"for vec ({n}, ...); got {mat.shape[0]}"
        )
    if n > MAX_N_ROLLED:
        raise ValueError(
            f"pallas sym_solve_cf implements N <= {MAX_N_ROLLED}")
    block = _default_block(n, block, bm)
    if refine is None:
        refine = 1 if n <= 4 else 0
    if interpret is None:
        interpret = _interpret_default()
    batch_shape = np.broadcast_shapes(mat.shape[1:], vec.shape[1:])
    dtype = jnp.result_type(mat, vec)
    mat = jnp.broadcast_to(mat.astype(dtype), (mat.shape[0], *batch_shape))
    vec = jnp.broadcast_to(vec.astype(dtype), (n, *batch_shape))
    m2 = mat.reshape(mat.shape[0], -1)
    v2 = vec.reshape(n, -1)
    out = _solve_cf(m2, v2, _prep_eps(eps, n, dtype), block, bool(interpret),
                    int(refine), bool(bm))
    return _downcast(out.reshape(n, *batch_shape), half)


# --- fused-iteration chain solve -------------------------------------------


def _solve_chain_kernel(n, eps_vec, iters, mat_ref, vec_ref, add_ref,
                        out_ref):
    """``x <- A \\ x + c`` iterated ``iters`` times entirely inside one
    grid step: the matrix block is read from HBM **once**, the
    loop-invariant solve machinery is computed **once** (cofactor grid
    + 1/det for N <= 4; the packed pivoted-LU factorization + 1/U_ii
    for 5 <= N <= 8 — standard factor-once/solve-many), and every
    ``lax.fori_loop`` iteration then applies the complete solve to the
    new, data-dependent RHS in registers. HBM traffic per
    solve-iteration is ~(NN + 3N) * 4 / iters bytes, so the kernel is
    VPU-compute-bound — the fused form of the ``lax.scan``-of-
    ``sym_solve`` sustained workload (``bench.py``), which re-reads A
    and re-derives the factorization from HBM every iteration."""
    E = _entries_rows(mat_ref, n)
    if eps_vec is not None:
        for i in range(n):
            E[i][i] = E[i][i] + eps_vec[i]
    x0 = tuple(vec_ref[j] for j in range(n))
    c = [add_ref[j] for j in range(n)]

    if n == 1:
        inv = 1.0 / E[0][0]

        def body1(t, xs):
            return (xs[0] * inv + c[0],)

        xs = jax.lax.fori_loop(0, iters, body1, x0)
    elif n <= 4:
        cache = {}
        idx = tuple(range(n))
        det = _det_expand(E, idx, idx, cache)
        inv_det = 1.0 / det
        adj = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                rows = tuple(r for r in idx if r != j)
                cols = tuple(cc for cc in idx if cc != i)
                minor = _det_expand(E, rows, cols, cache)
                adj[i][j] = -minor if (i + j) % 2 else minor

        def body(t, xs):
            ys = []
            for i in range(n):
                acc = adj[i][0] * xs[0]
                for j in range(1, n):
                    acc = acc + adj[i][j] * xs[j]
                ys.append(acc * inv_det + c[i])
            return tuple(ys)

        xs = jax.lax.fori_loop(0, iters, body, x0)
    elif n <= 8:
        E2 = [row[:] for row in E]
        _, pivs = _plu_grid(E2, [[] for _ in range(n)], n, record=True)
        inv_d = [1.0 / E2[i][i] for i in range(n)]

        def body_plu(t, xs):
            ys = _plu_substitute(E2, pivs, list(xs), n, inv_d)
            return tuple(y + ci for y, ci in zip(ys, c))

        xs = jax.lax.fori_loop(0, iters, body_plu, x0)
    else:
        # rolled tier (9 <= N <= 32): explicit inverse once per block
        # via the rolled PLU (the same algebra the N <= 4 path applies
        # per iteration — adj(A)/det IS the inverse), then one O(n^2)
        # masked matvec per iteration. Loop carry is a stacked (n,
        # lane) grid; no dynamic indexing (Mosaic).
        lane = E[0][0].shape
        A = jnp.stack([E[i][j] for i in range(n) for j in range(n)],
                      axis=0).reshape((n, n) + lane)
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, n) + (1,) * len(lane),
                                      0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (n, n) + (1,) * len(lane),
                                      1)
        eye = jnp.broadcast_to((ri == ci).astype(A.dtype), (n, n) + lane)
        U, R, _ = _plu_rolled(A, eye)
        Inv = _plu_rolled_backsub(U, R)  # Inv[i, j] = inv[i][j]
        x_st = jnp.stack(list(x0), axis=0)  # (n, *lane)
        c_st = jnp.stack(c, axis=0)

        def body_inv(t, xs):
            return jnp.sum(Inv * xs[None, :], axis=1) + c_st

        xs_st = jax.lax.fori_loop(0, iters, body_inv, x_st)
        for i in range(n):
            out_ref[i] = xs_st[i]
        return
    for i in range(n):
        out_ref[i] = xs[i]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _solve_chain_cf(mat, vec, add, eps_tuple, iters, block, interpret, bm):
    n = vec.shape[0]
    kern = functools.partial(_solve_chain_kernel, n, eps_tuple, iters)
    return _call_rows(kern, (mat, vec, add), n, block, interpret,
                      diag_rows=n, bm=bm, vmem_limit=_rolled_vmem(n))


def _solve_chain_fwd(mat, vec, add, eps_tuple, iters, block, interpret, bm):
    out = _solve_chain_cf(mat, vec, add, eps_tuple, iters, block, interpret,
                          bm)
    return out, (mat, vec, add)


def _solve_chain_bwd(eps_tuple, iters, block, interpret, bm, res, g):
    # Recompute-based VJP: replay the chain as `iters` differentiable
    # solves (each step's solve VJP is itself two kernel solves + a
    # compact outer) and pull back through the scan. Memory is
    # O(iters * batch) for the step residuals — fine at training-size
    # batches; the forward fused kernel exists for inference/benchmark
    # scale where no gradient is taken.
    mat, vec, add = res

    def replay(m, v, a):
        def body(x, _):
            return _solve_cf(m, x, eps_tuple, block, interpret, 0, bm) + a, ()

        return jax.lax.scan(body, v, None, length=iters)[0]

    _, pull = jax.vjp(replay, mat, vec, add)
    return pull(g)


_solve_chain_cf.defvjp(_solve_chain_fwd, _solve_chain_bwd)


def sym_solve_chain_cf(
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    iters: int = 1,
    add: Optional[jnp.ndarray] = None,
    eps=None,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    r"""Channel-first fused iterated solve: ``x_0 = vec``,
    ``x_{t+1} = A \ x_t + add``, returning ``x_iters``.

    One kernel launch runs the whole chain with the matrix block and
    its factorization resident in VMEM/registers (see
    :func:`_solve_chain_kernel`). This is an extension op (the
    reference has no fused iteration; its ``meanm`` loop re-launches
    per step, reference ``lie.py:76-91``) — the native tier for
    iterative workloads whose per-step state is a solve output.
    """
    mat, vec, half = upcast_half(mat, vec)
    n = vec.shape[0]
    if mat.shape[0] != compact_size(n):
        raise ValueError(
            f"channel-first sym_solve_chain expects mat "
            f"({compact_size(n)}, ...) for vec ({n}, ...); got "
            f"{mat.shape[0]}"
        )
    if n > MAX_N_ROLLED:
        raise ValueError(
            f"pallas sym_solve_chain_cf implements N <= {MAX_N_ROLLED}")
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if block is None:
        # chip-swept for the chain kernel: compute per grid step is
        # ~iters x the single-solve kernels', so smaller blocks
        # pipeline better (v5e, k=128/32: 4x4 2.39e10 at 8192 vs
        # 2.12e10 at 32768; 6x6 6.05e9 at 4096 vs 5.84e9 at 8192).
        # The rolled tier (n > 8) carries inverse + U + RHS stacked
        # grids — 4096 exceeds the 16 MB scoped-VMEM limit at 16x16
        block = 8192 if n <= 4 else (4096 if n <= 8 else 1024)
    if interpret is None:
        interpret = _interpret_default()
    dtype = jnp.result_type(mat, vec) if add is None else jnp.result_type(
        mat, vec, add)
    if add is None:
        add = jnp.zeros((n,) + (1,) * (vec.ndim - 1), dtype)
    batch_shape = np.broadcast_shapes(mat.shape[1:], vec.shape[1:],
                                      add.shape[1:])
    mat = jnp.broadcast_to(mat.astype(dtype), (mat.shape[0], *batch_shape))
    vec = jnp.broadcast_to(vec.astype(dtype), (n, *batch_shape))
    add = jnp.broadcast_to(add.astype(dtype), (n, *batch_shape))
    out = _solve_chain_cf(
        mat.reshape(mat.shape[0], -1), vec.reshape(n, -1),
        add.reshape(n, -1), _prep_eps(eps, n, dtype), int(iters), block,
        bool(interpret), bool(bm))
    return _downcast(out.reshape(n, *batch_shape), half)


# --- fused-iteration chain matvec (Richardson / Neumann) -------------------


def _matvec_chain_kernel(n, iters, mat_ref, vec_ref, add_ref, out_ref):
    """``x <- A x + c`` iterated ``iters`` times inside one grid step —
    the matvec analog of :func:`_solve_chain_kernel` (Richardson
    iteration; with ``spectral radius < 1`` it sums the Neumann series
    for ``(I - A) \\ c``). Pure unrolled FMA per iteration (n^2 + n
    flops), no division — the cheapest chain body, so it exposes the
    per-iteration VPU ceiling."""
    E = _entries_rows(mat_ref, n)
    x0 = tuple(vec_ref[j] for j in range(n))
    c = [add_ref[j] for j in range(n)]
    if n <= 8:
        def body(t, xs):
            ys = []
            for i in range(n):
                acc = E[i][0] * xs[0]
                for j in range(1, n):
                    acc = acc + E[i][j] * xs[j]
                ys.append(acc + c[i])
            return tuple(ys)

        xs = jax.lax.fori_loop(0, iters, body, x0)
        for i in range(n):
            out_ref[i] = xs[i]
        return
    lane = E[0][0].shape
    A = jnp.stack([E[i][j] for i in range(n) for j in range(n)],
                  axis=0).reshape((n, n) + lane)
    x_st = jnp.stack(list(x0), axis=0)
    c_st = jnp.stack(c, axis=0)

    def body_st(t, xs):
        return jnp.sum(A * xs[None, :], axis=1) + c_st

    xs_st = jax.lax.fori_loop(0, iters, body_st, x_st)
    for i in range(n):
        out_ref[i] = xs_st[i]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _matvec_chain_cf(mat, vec, add, iters, block, interpret, bm):
    n = vec.shape[0]
    kern = functools.partial(_matvec_chain_kernel, n, iters)
    return _call_rows(kern, (mat, vec, add), n, block, interpret,
                      diag_rows=0, bm=bm, vmem_limit=_rolled_vmem(n))


def _matvec_chain_fwd(mat, vec, add, iters, block, interpret, bm):
    out = _matvec_chain_cf(mat, vec, add, iters, block, interpret, bm)
    return out, (mat, vec, add)


def _matvec_chain_bwd(iters, block, interpret, bm, res, g):
    mat, vec, add = res

    def replay(m, v, a):
        def body(x, _):
            return _matvec_cf(m, x, block, interpret, bm) + a, ()

        return jax.lax.scan(body, v, None, length=iters)[0]

    _, pull = jax.vjp(replay, mat, vec, add)
    return pull(g)


_matvec_chain_cf.defvjp(_matvec_chain_fwd, _matvec_chain_bwd)


def sym_matvec_chain_cf(
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    iters: int = 1,
    add: Optional[jnp.ndarray] = None,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    r"""Channel-first fused iterated matvec: ``x_0 = vec``,
    ``x_{t+1} = A x_t + add``, returning ``x_iters``.

    The matvec analog of :func:`sym_solve_chain_cf` (Richardson /
    Neumann-series iteration). Extension op — the reference has no
    fused iteration. Note the recurrence diverges when the spectral
    radius of ``A`` exceeds 1 (user-scaled, exactly as in classical
    Richardson)."""
    mat, vec, half = upcast_half(mat, vec)
    n = vec.shape[0]
    if mat.shape[0] != compact_size(n):
        raise ValueError(
            f"channel-first sym_matvec_chain expects mat "
            f"({compact_size(n)}, ...) for vec ({n}, ...); got "
            f"{mat.shape[0]}"
        )
    if n > MAX_N_ROLLED:
        raise ValueError(
            f"pallas sym_matvec_chain_cf implements N <= {MAX_N_ROLLED}")
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if block is None:
        block = 8192 if n <= 4 else (4096 if n <= 8 else 1024)
    if interpret is None:
        interpret = _interpret_default()
    dtype = jnp.result_type(mat, vec) if add is None else jnp.result_type(
        mat, vec, add)
    if add is None:
        add = jnp.zeros((n,) + (1,) * (vec.ndim - 1), dtype)
    batch_shape = np.broadcast_shapes(mat.shape[1:], vec.shape[1:],
                                      add.shape[1:])
    mat = jnp.broadcast_to(mat.astype(dtype), (mat.shape[0], *batch_shape))
    vec = jnp.broadcast_to(vec.astype(dtype), (n, *batch_shape))
    add = jnp.broadcast_to(add.astype(dtype), (n, *batch_shape))
    out = _matvec_chain_cf(
        mat.reshape(mat.shape[0], -1), vec.reshape(n, -1),
        add.reshape(n, -1), int(iters), block, bool(interpret), bool(bm))
    return _downcast(out.reshape(n, *batch_shape), half)


# --- fused power iteration (dominant eigenpair) ----------------------------


def _guarded_rsqrt(nrm2):
    """1/sqrt(x) with 0 -> 0 (padded/zero lanes stay finite)."""
    return jnp.where(nrm2 > 0, jax.lax.rsqrt(jnp.where(nrm2 > 0, nrm2, 1.0)),
                     jnp.zeros_like(nrm2))


def _maxeig_kernel(n, iters, renorm_every, mat_ref, vec_ref, out_ref):
    """Fused batched power iteration: ``v <- A v / ||A v||`` iterated
    ``iters`` times with the compact matrix rows register-resident, then
    one final Rayleigh quotient ``mu = v^T A v``. Output rows: ``mu``
    then the ``n`` unit-eigenvector rows.

    Power iteration is scale-invariant, so the per-step normalization
    only exists to keep the iterate in floating-point range — but its
    dependent rsqrt + cross-row reduction serializes against the matvec
    FMA stream and costs ~4x a pure-FMA chain step (measured round 3).
    The kernel therefore renormalizes every ``renorm_every`` matvecs;
    in between, steps are pure n^2-FMA chains. Range safety comes from
    a one-time per-lane Gershgorin pre-scale ``A / max_i sum_j |a_ij|``:
    the scaled spectrum lies in [-1, 1] with the dominant ``|λ| >=
    1/sqrt(n)`` (``‖A‖₂ >= ‖A‖∞/sqrt(n)``), so over r <= 16 unnormalized
    steps the dominant component shrinks by at most ``n^(r/2)`` —
    within f32 range for any input scale (the final ``mu`` un-scales).
    In exact arithmetic the result is identical to per-step
    normalization; iterates whose dominant-eigenvector component is
    below ~1e-30 of the start vector may flush to zero where per-step
    renorm would survive (supply ``v0`` in that regime).
    HBM traffic per iteration is ~(NN + 2n) * 4 / iters bytes, the
    power-iteration analog of :func:`_solve_chain_kernel`."""
    E = _entries_rows(mat_ref, n)
    r = int(renorm_every)  # validated 1..16 by the wrapper
    n_out, rem = iters // r, iters % r
    if n <= 8:
        # per-lane Gershgorin bound -> scale-invariant iteration
        g = None
        for i in range(n):
            row = jnp.abs(E[i][0])
            for j in range(1, n):
                row = row + jnp.abs(E[i][j])
            g = row if g is None else jnp.maximum(g, row)
        inv_g = jnp.where(g > 0, 1.0 / jnp.where(g > 0, g, 1.0),
                          jnp.zeros_like(g))
        Es = [[E[i][j] * inv_g for j in range(n)] for i in range(n)]

        def mv(vs):
            out = []
            for i in range(n):
                acc = Es[i][0] * vs[0]
                for j in range(1, n):
                    acc = acc + Es[i][j] * vs[j]
                out.append(acc)
            return out

        def renorm(vs):
            nrm2 = vs[0] * vs[0]
            for i in range(1, n):
                nrm2 = nrm2 + vs[i] * vs[i]
            s = _guarded_rsqrt(nrm2)
            return tuple(vi * s for vi in vs)

        v0 = renorm(tuple(vec_ref[j] for j in range(n)))

        def body(t, vs):
            for _ in range(r):
                vs = mv(list(vs))
            return renorm(vs)

        vs = jax.lax.fori_loop(0, n_out, body, v0)
        for _ in range(rem):
            vs = mv(list(vs))
        vs = renorm(vs)
        w = mv(list(vs))
        mu = vs[0] * w[0]
        for i in range(1, n):
            mu = mu + vs[i] * w[i]
        out_ref[0] = mu * g  # un-scale the Rayleigh quotient
        for i in range(n):
            out_ref[1 + i] = vs[i]
        return
    # rolled tier (9 <= n <= 32): stacked (n, *lane) carry, masked matvec
    lane = E[0][0].shape
    A = jnp.stack([E[i][j] for i in range(n) for j in range(n)],
                  axis=0).reshape((n, n) + lane)
    g = jnp.max(jnp.sum(jnp.abs(A), axis=1), axis=0)
    inv_g = jnp.where(g > 0, 1.0 / jnp.where(g > 0, g, 1.0),
                      jnp.zeros_like(g))
    As = A * inv_g[None, None]

    def renorm_st(vs):
        return vs * _guarded_rsqrt(jnp.sum(vs * vs, axis=0))[None]

    v = renorm_st(jnp.stack([vec_ref[j] for j in range(n)], axis=0))

    def body_st(t, vs):
        for _ in range(r):
            vs = jnp.sum(As * vs[None, :], axis=1)
        return renorm_st(vs)

    vs = jax.lax.fori_loop(0, n_out, body_st, v)
    for _ in range(rem):
        vs = jnp.sum(As * vs[None, :], axis=1)
    vs = renorm_st(vs)
    w = jnp.sum(As * vs[None, :], axis=1)
    out_ref[0] = jnp.sum(vs * w, axis=0) * g
    for i in range(n):
        out_ref[1 + i] = vs[i]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _maxeig_cf(mat, vec, iters, block, interpret, bm, renorm_every):
    n = vec.shape[0]
    kern = functools.partial(_maxeig_kernel, n, iters, renorm_every)
    return _call_rows(kern, (mat, vec), n + 1, block, interpret,
                      diag_rows=n, bm=bm, vmem_limit=_rolled_vmem(n))


def _maxeig_replay(mat, vec, iters):
    """The kernel recurrence as differentiable channel-first XLA ops
    (VJP replay; also the reference implementation the tests oracle).

    Pre-scales by the per-lane Gershgorin bound like the kernel: an
    unscaled matvec at ``||A|| >~ 1e19`` overflows the f32 norm^2 and
    `_guarded_rsqrt(inf) = 0` silently zeroes the iterate — the primal
    kernel is range-safe, so the replay (and hence the VJP) must be
    too. The scale's own derivative terms cancel identically (the
    dominant eigenvalue is 1-homogeneous in A, so the dg terms of
    ``mu = g * rayleigh(A / g)`` vanish), hence ``stop_gradient(g)``
    yields the exact pullback — and avoids the f32 overflow of the
    huge intermediate cotangent the naive chain rule routes through
    ``1/g`` at extreme input scales."""
    n = vec.shape[0]
    g = None
    for i in range(n):
        row = jnp.abs(mat[i])
        for j in range(n):
            if j != i:
                row = row + jnp.abs(mat[tri_index(i, j, n)])
        g = row if g is None else jnp.maximum(g, row)
    g = jax.lax.stop_gradient(g)
    inv_g = jnp.where(g > 0, 1.0 / jnp.where(g > 0, g, 1.0),
                      jnp.zeros_like(g))
    ms = mat * inv_g

    def mv(v):
        rows = []
        for i in range(n):
            acc = ms[i] * v[i]
            for j in range(n):
                if j != i:
                    acc = acc + ms[tri_index(i, j, n)] * v[j]
            rows.append(acc)
        return jnp.stack(rows, axis=0)

    v = vec * _guarded_rsqrt(jnp.sum(vec * vec, axis=0))[None]

    def body(v, _):
        w = mv(v)
        return w * _guarded_rsqrt(jnp.sum(w * w, axis=0))[None], ()

    v, _ = jax.lax.scan(body, v, None, length=iters)
    w = mv(v)
    mu = jnp.sum(v * w, axis=0) * g
    return jnp.concatenate([mu[None], v], axis=0)


def _maxeig_fwd(mat, vec, iters, block, interpret, bm, renorm_every):
    return (_maxeig_cf(mat, vec, iters, block, interpret, bm, renorm_every),
            (mat, vec))


def _maxeig_bwd(iters, block, interpret, bm, renorm_every, res, g):
    # the replay renormalizes every step — power iteration is
    # scale-invariant, so the recurrences share the same limit and the
    # VJP at convergence is the classical v v^T pullback either way
    mat, vec = res
    _, pull = jax.vjp(lambda m, v: _maxeig_replay(m, v, iters), mat, vec)
    return pull(g)


_maxeig_cf.defvjp(_maxeig_fwd, _maxeig_bwd)


def sym_maxeig_cf(
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    iters: int = 32,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
    bm: bool = False,
    renorm_every: int = 8,
) -> jnp.ndarray:
    r"""Channel-first fused batched power iteration: returns
    ``(1 + N, ...)`` — row 0 the Rayleigh-quotient estimate of the
    dominant (largest-``|λ|``) eigenvalue, rows 1.. the unit
    eigenvector estimate.

    One kernel launch runs all ``iters`` matvec steps with the compact
    matrix block register-resident (the power-iteration analog of
    :func:`sym_solve_chain_cf`). Extension op: the reference's
    ``maxeig_power`` (reference ``stochastic.py:316-361``) is a
    single-matrix while_loop re-launching one matvec per step.
    Convergence is ``O((λ2/λ1)^iters)`` — ``iters`` is a static knob,
    not a tolerance.

    ``renorm_every`` (1..16, default 8): matvecs per normalization.
    A one-time per-lane Gershgorin pre-scale makes the iteration safe
    at any stride <= 16 (see :func:`_maxeig_kernel`); between renorms
    the steps are pure FMA chains, removing the dependent rsqrt +
    cross-row reduction that costs ~4x a chain step. ``renorm_every=1``
    recovers textbook per-step normalization.
    """
    mat, vec, half = upcast_half(mat, vec)
    n = vec.shape[0]
    if mat.shape[0] != compact_size(n):
        raise ValueError(
            f"channel-first sym_maxeig expects mat ({compact_size(n)}, ...) "
            f"for vec ({n}, ...); got {mat.shape[0]}"
        )
    if n > MAX_N_ROLLED:
        raise ValueError(
            f"pallas sym_maxeig_cf implements N <= {MAX_N_ROLLED}")
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not 1 <= int(renorm_every) <= 16:
        # > 16 unnormalized steps can leave f32 range even under the
        # Gershgorin pre-scale (dominant |λ| >= 1/sqrt(n) only bounds
        # the shrink to n^(r/2))
        raise ValueError("renorm_every must be in 1..16")
    if block is None:
        block = 8192 if n <= 4 else (4096 if n <= 8 else 1024)
    if interpret is None:
        interpret = _interpret_default()
    dtype = jnp.result_type(mat, vec)
    batch_shape = np.broadcast_shapes(mat.shape[1:], vec.shape[1:])
    mat = jnp.broadcast_to(mat.astype(dtype), (mat.shape[0], *batch_shape))
    vec = jnp.broadcast_to(vec.astype(dtype), (n, *batch_shape))
    out = _maxeig_cf(mat.reshape(mat.shape[0], -1), vec.reshape(n, -1),
                     int(iters), block, bool(interpret), bool(bm),
                     int(renorm_every))
    return _downcast(out.reshape(1 + n, *batch_shape), half)


# --- matvec ----------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _matvec_cf(mat, vec, block, interpret, bm=False):
    n = vec.shape[0]
    kern = functools.partial(_matvec_kernel, n)
    return _call_rows(kern, (mat, vec), n, block, interpret, bm=bm)


def _matvec_cf_fwd(mat, vec, block, interpret, bm=False):
    return _matvec_cf(mat, vec, block, interpret, bm), (mat, vec)


def _matvec_cf_bwd(block, interpret, bm, res, g):
    # y = A v: dv = A g (symmetric); dA compact: diag_i = g_i v_i,
    # offdiag (i<j) = g_i v_j + g_j v_i
    mat, vec = res
    n = vec.shape[0]
    dv = _matvec_cf(mat, g, block, interpret, bm)
    rows = [g[i] * vec[i] for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            rows.append(g[i] * vec[j] + g[j] * vec[i])
    return jnp.stack(rows, axis=0), dv


_matvec_cf.defvjp(_matvec_cf_fwd, _matvec_cf_bwd)


def sym_matvec_cf(
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    """Channel-first compact-symmetric matvec ``A @ v``:
    ``mat (NN, ...)``, ``vec (N, ...)`` -> ``(N, ...)`` (Pallas)."""
    mat, vec, half = upcast_half(mat, vec)
    n = vec.shape[0]
    if mat.shape[0] != compact_size(n):
        raise ValueError(
            f"channel-first sym_matvec expects mat ({compact_size(n)}, ...); "
            f"got {mat.shape[0]} for vec ({n}, ...)"
        )
    if interpret is None:
        interpret = _interpret_default()
    batch_shape = np.broadcast_shapes(mat.shape[1:], vec.shape[1:])
    dtype = jnp.result_type(mat, vec)
    mat = jnp.broadcast_to(mat.astype(dtype), (mat.shape[0], *batch_shape))
    vec = jnp.broadcast_to(vec.astype(dtype), (n, *batch_shape))
    out = _matvec_cf(mat.reshape(mat.shape[0], -1), vec.reshape(n, -1),
                     block, bool(interpret), bool(bm))
    return _downcast(out.reshape(n, *batch_shape), half)


# --- invert ----------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _invert_cf(mat, block, interpret, bm=False):
    n = sym_dim(mat.shape[0])
    kern = functools.partial(_invert_kernel, n)
    return _call_rows(kern, (mat,), mat.shape[0], block, interpret,
                      diag_rows=n, bm=bm, vmem_limit=_rolled_vmem(n))


def _invert_cf_fwd(mat, block, interpret, bm=False):
    y = _invert_cf(mat, block, interpret, bm)
    return y, y


def _invert_cf_bwd(block, interpret, bm, y, g):
    # Y = inv(A) read from the upper triangle: with Gbar[i,j] = g_k for
    # i <= j (0 below), Abar_full = -Y Gbar Y, and the compact cotangent
    # folds (i, j) + (j, i). Trace-time n^4 loop (n <= 8); batch-major
    # MXU matmuls beyond (the loop would trace 65k+ terms at n=16).
    nn = y.shape[0]
    n = sym_dim(nn)
    if n > 8:
        from ..layouts.sym import sym_to_full

        Yf = sym_to_full(jnp.moveaxis(y, 0, -1))  # (..., n, n)
        idxmap = np.asarray(
            [[tri_index(i, j, n) for j in range(n)] for i in range(n)])
        upper = np.triu(np.ones((n, n), dtype=bool))
        Gm = jnp.moveaxis(g, 0, -1)
        Gf = jnp.where(jnp.asarray(upper), Gm[..., jnp.asarray(idxmap)],
                       jnp.zeros((), g.dtype))
        Ab = -(Yf @ Gf @ Yf)
        rows = [Ab[..., i, i] for i in range(n)]
        for i in range(n):
            for j in range(i + 1, n):
                rows.append(Ab[..., i, j] + Ab[..., j, i])
        return (jnp.stack(rows, axis=0),)
    Y = [[y[tri_index(i, j, n)] for j in range(n)] for i in range(n)]
    G = [[g[tri_index(i, j, n)] if i <= j else None for j in range(n)]
         for i in range(n)]

    def abar(a, b):
        acc = None
        for i in range(n):
            for j in range(i, n):
                term = Y[a][i] * G[i][j] * Y[j][b]
                acc = term if acc is None else acc + term
        return -acc

    rows = [abar(i, i) for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            rows.append(abar(i, j) + abar(j, i))
    return (jnp.stack(rows, axis=0),)


_invert_cf.defvjp(_invert_cf_fwd, _invert_cf_bwd)


def sym_invert_cf(
    mat: jnp.ndarray,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    """Channel-first compact-symmetric inverse ``(NN, ...) -> (NN, ...)``
    (Pallas; adjugate N <= 4, in-register unrolled pivoted LU against
    identity columns for 5 <= N <= 8), with a hand-derived
    compact-cotangent VJP."""
    mat, half = upcast_half(mat)
    nn = mat.shape[0]
    n = sym_dim(nn)
    if n > MAX_N_ROLLED:
        raise ValueError(
            f"pallas sym_invert_cf implements N <= {MAX_N_ROLLED}")
    block = _default_block(n, block, bm)
    if interpret is None:
        interpret = _interpret_default()
    batch_shape = mat.shape[1:]
    m2 = mat.reshape(nn, -1)
    out = _invert_cf(m2, block, bool(interpret), bool(bm))
    return _downcast(out.reshape(nn, *batch_shape), half)


# --- fused accumulate matvec (jitfields sym_addmatvec / sym_submatvec) ------


def _accmatvec_kernel(n, sign, acc_ref, mat_ref, vec_ref, out_ref):
    v = [vec_ref[j] for j in range(n)]
    for i in range(n):
        mv = mat_ref[i] * v[i]
        for j in range(n):
            if j != i:
                mv = mv + mat_ref[tri_index(i, j, n)] * v[j]
        out_ref[i] = acc_ref[i] + sign * mv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _accmatvec_cf(acc, mat, vec, sign, block, interpret, bm=False):
    n = vec.shape[0]
    kern = functools.partial(_accmatvec_kernel, n, sign)
    return _call_rows(kern, (acc, mat, vec), n, block, interpret, bm=bm)


def _accmatvec_cf_fwd(acc, mat, vec, sign, block, interpret, bm=False):
    return (_accmatvec_cf(acc, mat, vec, sign, block, interpret, bm),
            (mat, vec))


def _accmatvec_cf_bwd(sign, block, interpret, bm, res, g):
    # y = acc +/- A v: dacc = g, dv = +/- A g, dA compact as in matvec
    mat, vec = res
    n = vec.shape[0]
    dv = _matvec_cf(mat, g, block, interpret, bm)
    if sign < 0:
        dv = -dv
    rows = [sign * g[i] * vec[i] for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            rows.append(sign * (g[i] * vec[j] + g[j] * vec[i]))
    return g, jnp.stack(rows, axis=0), dv


_accmatvec_cf.defvjp(_accmatvec_cf_fwd, _accmatvec_cf_bwd)


def _accmatvec_public(acc, mat, vec, sign, block, interpret, name, bm=False):
    acc, mat, vec, half = upcast_half(acc, mat, vec)
    n = vec.shape[0]
    if mat.shape[0] != compact_size(n):
        raise ValueError(
            f"channel-first {name} expects mat ({compact_size(n)}, ...) "
            f"for vec ({n}, ...); got {mat.shape[0]}"
        )
    if interpret is None:
        interpret = _interpret_default()
    batch_shape = np.broadcast_shapes(acc.shape[1:], mat.shape[1:],
                                      vec.shape[1:])
    dtype = jnp.result_type(acc, mat, vec)
    acc = jnp.broadcast_to(acc.astype(dtype), (n, *batch_shape))
    mat = jnp.broadcast_to(mat.astype(dtype), (mat.shape[0], *batch_shape))
    vec = jnp.broadcast_to(vec.astype(dtype), (n, *batch_shape))
    out = _accmatvec_cf(acc.reshape(n, -1), mat.reshape(mat.shape[0], -1),
                        vec.reshape(n, -1), sign, block, bool(interpret),
                        bool(bm))
    return _downcast(out.reshape(n, *batch_shape), half)


def sym_addmatvec_cf(
    acc: jnp.ndarray,
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    """Channel-first fused ``acc + A @ v`` (Pallas; one memory pass).

    Native-tier analog of jitfields ``sym_addmatvec`` (reference
    ``sym.py:28-37``).
    """
    return _accmatvec_public(acc, mat, vec, 1.0, block, interpret,
                             "sym_addmatvec", bm)


def sym_submatvec_cf(
    acc: jnp.ndarray,
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    """Channel-first fused ``acc - A @ v`` (Pallas; one memory pass).

    Native-tier analog of jitfields ``sym_submatvec``.
    """
    return _accmatvec_public(acc, mat, vec, -1.0, block, interpret,
                             "sym_submatvec", bm)


# --- compact outer product --------------------------------------------------


def _outer_kernel(n, x_ref, out_ref):
    x = [x_ref[i] for i in range(n)]
    for i in range(n):
        out_ref[i] = x[i] * x[i]
    for i in range(n):
        for j in range(i + 1, n):
            out_ref[tri_index(i, j, n)] = x[i] * x[j]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _outer_cf(x, block, interpret, bm=False):
    n = x.shape[0]
    kern = functools.partial(_outer_kernel, n)
    return _call_rows(kern, (x,), compact_size(n), block, interpret, bm=bm)


def _outer_cf_fwd(x, block, interpret, bm=False):
    return _outer_cf(x, block, interpret, bm), x


def _outer_cf_bwd(block, interpret, bm, x, g):
    # y_ii = x_i^2, y_ij = x_i x_j:
    # dx_i = 2 g_i x_i + sum_{j != i} g_{tri(i,j)} x_j
    n = x.shape[0]
    rows = []
    for i in range(n):
        acc = 2.0 * g[i] * x[i]
        for j in range(n):
            if j != i:
                acc = acc + g[tri_index(i, j, n)] * x[j]
        rows.append(acc)
    return (jnp.stack(rows, axis=0),)


_outer_cf.defvjp(_outer_cf_fwd, _outer_cf_bwd)


def sym_outer_cf(
    x: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    """Channel-first compact outer product ``x x^T``:
    ``(N, ...) -> (NN, ...)`` (Pallas).

    Native-tier analog of :func:`fastmath_tpu.ops.sym.sym_outer`
    (reference ``_impl/sym.py:496-528``).
    """
    x, half = upcast_half(x)
    n = x.shape[0]
    if interpret is None:
        interpret = _interpret_default()
    batch_shape = x.shape[1:]
    out = _outer_cf(x.reshape(n, -1), block, bool(interpret), bool(bm))
    return _downcast(out.reshape(compact_size(n), *batch_shape), half)


# --- compact determinant ----------------------------------------------------


def _det_sym_kernel(n, mat_ref, out_ref):
    from ..ops.sym import _det_expand

    E = _entries_rows(mat_ref, n)
    if n > 8:
        lane = E[0][0].shape
        A = jnp.stack([E[i][j] for i in range(n) for j in range(n)],
                      axis=0).reshape((n, n) + lane)
        U, _, parity = _plu_rolled(A)
        det = U[0, 0]
        for i in range(1, n):
            det = det * U[i, i]
        out_ref[0] = det * parity
        return
    if n > 4:
        # in-register PLU: det = parity * prod(diag(U))
        E = [row[:] for row in E]
        R = [[] for _ in range(n)]
        parity = _plu_grid(E, R, n)
        det = E[0][0]
        for i in range(1, n):
            det = det * E[i][i]
        out_ref[0] = det * parity
        return
    idx = tuple(range(n))
    out_ref[0] = _det_expand(E, idx, idx, {})


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _det_sym_cf(mat, block, interpret, bm=False):
    n = sym_dim(mat.shape[0])
    kern = functools.partial(_det_sym_kernel, n)
    return _call_rows(kern, (mat,), 1, block, interpret, diag_rows=n,
                      bm=bm, vmem_limit=_rolled_vmem(n))[0]


def _det_sym_cf_fwd(mat, block, interpret, bm=False):
    return _det_sym_cf(mat, block, interpret, bm), mat


def _det_sym_cf_bwd(block, interpret, bm, mat, g):
    # d det / d compact: diag slot i -> cof(i, i); offdiag slot (i, j)
    # -> 2 cof(i, j) (the entry appears at (i, j) and (j, i)).
    from ..ops.sym import _det_expand

    n = sym_dim(mat.shape[0])
    if n > 4:
        # cof = det * inv (symmetric): one compact det + one compact
        # inverse through the same Pallas tier
        det = _det_sym_cf(mat, block, interpret, bm)
        inv = _invert_cf(mat, block, interpret, bm)
        gd = g * det
        rows = [gd * inv[i] for i in range(n)]
        for i in range(n):
            for j in range(i + 1, n):
                rows.append(2.0 * gd * inv[tri_index(i, j, n)])
        return (jnp.stack(rows, axis=0),)
    E = _entries_rows(mat, n)
    idx = tuple(range(n))
    cache = {}
    _det_expand(E, idx, idx, cache)  # warm shared minors

    def cof(i, j):
        rows = tuple(r for r in idx if r != i)
        cols = tuple(c for c in idx if c != j)
        minor = _det_expand(E, rows, cols, cache)
        return -minor if (i + j) % 2 else minor

    rows = [g * cof(i, i) for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            rows.append(2.0 * g * cof(i, j))
    return (jnp.stack(rows, axis=0),)


_det_sym_cf.defvjp(_det_sym_cf_fwd, _det_sym_cf_bwd)


def sym_det_cf(
    mat: jnp.ndarray,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    """Channel-first compact-symmetric determinant ``(NN, ...) -> (...)``
    (Pallas; adjugate N <= 4, in-register pivoted LU 5 <= N <= 8).

    Native-tier analog of :func:`fastmath_tpu.ops.sym.sym_det`
    (reference ``_impl/sym.py:401-452``).
    """
    mat, half = upcast_half(mat)
    nn = mat.shape[0]
    n = sym_dim(nn)
    if n > MAX_N_ROLLED:
        raise ValueError(
            f"pallas sym_det_cf implements N <= {MAX_N_ROLLED}")
    block = _default_block(n, block, bm)
    if interpret is None:
        interpret = _interpret_default()
    batch_shape = mat.shape[1:]
    out = _det_sym_cf(mat.reshape(nn, -1), block, bool(interpret), bool(bm))
    return _downcast(out.reshape(batch_shape), half)


# --- congruence product J^T H J (jhj) ---------------------------------------


#: fully unrolled congruence product through 6; rolled stacked-grid
#: form (k + k static rank-1 broadcast FMA passes, O(k) traced ops)
#: for 7 <= max(K, D) <= 32
_JHJ_UNROLL_MAX = 6
_JHJ_MAX_ROLLED = 32


def _jhj_kernel(k, d, j_ref, h_ref, out_ref):
    if max(k, d) > _JHJ_UNROLL_MAX:
        # rolled stacked-grid tier: HJ = H @ J and G = J^T @ (HJ) as
        # k static rank-1 broadcast FMAs each (the _mm_st idiom —
        # rank-4 temps only; a single einsum would need a rank-5
        # (k, k, d, lane) intermediate)
        lane = j_ref[0].shape
        J = jnp.stack([j_ref[a * d + i] for a in range(k)
                       for i in range(d)], axis=0).reshape((k, d) + lane)
        H = jnp.stack([h_ref[tri_index(a, b, k)] for a in range(k)
                       for b in range(k)], axis=0).reshape((k, k) + lane)
        HJ = None
        for b in range(k):
            term = H[:, b][:, None] * J[b][None, :]
            HJ = term if HJ is None else HJ + term
        G = None
        for a in range(k):
            term = J[a][:, None] * HJ[a][None, :]
            G = term if G is None else G + term
        for i in range(d):
            out_ref[i] = G[i, i]
        for i in range(d):
            for jj in range(i + 1, d):
                # exact inverse-transpose symmetry (G is symmetric in
                # exact arithmetic; averaging removes roundoff skew)
                out_ref[tri_index(i, jj, d)] = 0.5 * (G[i, jj] + G[jj, i])
        return
    H = _entries_rows(h_ref, k)
    J = [[j_ref[a * d + i] for i in range(d)] for a in range(k)]
    HJ = [[None] * d for _ in range(k)]
    for a in range(k):
        for jj in range(d):
            acc = H[a][0] * J[0][jj]
            for b in range(1, k):
                acc = acc + H[a][b] * J[b][jj]
            HJ[a][jj] = acc
    for i in range(d):
        acc = J[0][i] * HJ[0][i]
        for a in range(1, k):
            acc = acc + J[a][i] * HJ[a][i]
        out_ref[i] = acc
    for i in range(d):
        for jj in range(i + 1, d):
            acc = J[0][i] * HJ[0][jj]
            for a in range(1, k):
                acc = acc + J[a][i] * HJ[a][jj]
            out_ref[tri_index(i, jj, d)] = acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _jhj_cf(j2, h2, d, block, interpret, bm=False):
    k = sym_dim(h2.shape[0])
    kern = functools.partial(_jhj_kernel, k, d)
    return _call_rows(kern, (j2, h2), compact_size(d), block, interpret,
                      bm=bm, vmem_limit=_rolled_vmem(max(k, d)))


def _jhj_cf_fwd(j2, h2, d, block, interpret, bm=False):
    return _jhj_cf(j2, h2, d, block, interpret, bm), (j2, h2)


def _jhj_cf_bwd(d, block, interpret, bm, res, g):
    # out[(i,jj)] = sum_ab J[a,i] H[a,b] J[b,jj]  (H symmetric).
    # With Gf the symmetric expansion of the compact cotangent
    # (Gf[i][i] = g_i, Gf[i][j] = g_(i,j) for i != j):
    #   Hbar[a][b](compact) folds J Gf J^T;  Jbar = 2 H J Gf.
    j2, h2 = res
    k = sym_dim(h2.shape[0])
    if max(k, d) > _JHJ_UNROLL_MAX:
        # batch-major MXU matmul form: the trace-time elementwise fold
        # below emits ~2 k^2 d ops (65k+ at 32) — backward passes take
        # batched dot_generals instead (cf. batched._inv_cf_bwd)
        from ..layouts.sym import sym_to_full

        batch = j2.shape[1:]
        Jm = jnp.moveaxis(j2, 0, -1).reshape(*batch, k, d)
        Hm = sym_to_full(jnp.moveaxis(h2, 0, -1), k)  # (..., k, k)
        grows = [
            jnp.stack(
                [
                    g[tri_index(i, jj, d)] if i == jj
                    else 0.5 * g[tri_index(i, jj, d)]
                    for jj in range(d)
                ],
                axis=-1,
            )
            for i in range(d)
        ]
        Gf = jnp.stack(grows, axis=-2)  # (..., d, d) halved off-diag
        JG = Jm @ Gf  # (..., k, d)
        Hbar = Jm @ jnp.swapaxes(JG, -1, -2)  # (..., k, k)
        hrows = [Hbar[..., a, a] for a in range(k)]
        hrows += [Hbar[..., a, b] + Hbar[..., b, a]
                  for a in range(k) for b in range(a + 1, k)]
        dh = jnp.stack(hrows, axis=0)
        Jbar = 2.0 * (Hm @ JG)  # (..., k, d)
        dj = jnp.moveaxis(Jbar.reshape(*batch, k * d), -1, 0)
        return dj, dh
    J = [[j2[a * d + i] for i in range(d)] for a in range(k)]
    H = _entries_rows(h2, k)
    # symmetric expansion of the compact cotangent with off-diagonal
    # entries HALVED (each compact off-diag slot is a single stored
    # value; the factor 2 reappears in the fold-back below)
    Gf = [
        [
            g[tri_index(i, jj, d)] if i == jj
            else 0.5 * g[tri_index(i, jj, d)]
            for jj in range(d)
        ]
        for i in range(d)
    ]

    def jgf(a, i):  # (J Gf)[a][i]
        acc = J[a][0] * Gf[0][i]
        for m in range(1, d):
            acc = acc + J[a][m] * Gf[m][i]
        return acc

    JG = [[jgf(a, i) for i in range(d)] for a in range(k)]
    # Hbar_full[a][b] = sum_i J[a,i] (J Gf^T)[b,i] = (J Gf J^T)[a][b]
    def hbar_full(a, b):
        acc = JG[b][0] * J[a][0]
        for i in range(1, d):
            acc = acc + JG[b][i] * J[a][i]
        return acc

    hrows = [hbar_full(i, i) for i in range(k)]
    for a in range(k):
        for b in range(a + 1, k):
            hrows.append(hbar_full(a, b) + hbar_full(b, a))
    dh = jnp.stack(hrows, axis=0)
    # Jbar[a][i] = 2 sum_b H[a][b] (J Gf)[b][i]   (Gf symmetric)
    jrows = []
    for a in range(k):
        for i in range(d):
            acc = H[a][0] * JG[0][i]
            for b in range(1, k):
                acc = acc + H[a][b] * JG[b][i]
            jrows.append(2.0 * acc)
    return jnp.stack(jrows, axis=0), dh


_jhj_cf.defvjp(_jhj_cf_fwd, _jhj_cf_bwd)


def sym_matmul_cf(
    j: jnp.ndarray,
    h: jnp.ndarray,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    """Channel-first congruence product ``J^T H J``:
    ``j (K*D, ...)`` row-major full, ``h (K(K+1)/2, ...)`` compact ->
    ``(D(D+1)/2, ...)`` compact (Pallas; fully unrolled K, D <= 6 —
    the XLA tier's unroll gate — rolled stacked-grid form for
    7 <= max(K, D) <= 32: two passes of k static rank-1 broadcast
    FMAs, the ``_mm_st`` idiom).

    Native-tier analog of :func:`fastmath_tpu.ops.sym.sym_matmul`
    (reference jhj kernels, ``_impl/sym.py:637-670``), with a
    hand-derived compact-cotangent VJP (batch-major MXU matmul form
    on the rolled tier).
    """
    j, h, half = upcast_half(j, h)
    k = sym_dim(h.shape[0])
    if j.shape[0] % k:
        raise ValueError(
            f"j channel count {j.shape[0]} is not a multiple of K={k}"
        )
    d = j.shape[0] // k
    if max(k, d) > _JHJ_MAX_ROLLED:
        raise ValueError(
            f"pallas sym_matmul_cf implements K, D <= {_JHJ_MAX_ROLLED}")
    if block is None:
        block = (DEFAULT_BLOCK if max(k, d) <= 4
                 else (4096 if max(k, d) <= _JHJ_UNROLL_MAX else 1024))
    if interpret is None:
        interpret = _interpret_default()
    if max(k, d) > _JHJ_UNROLL_MAX and not interpret:
        # stacked-grid sublane rule (see _sublane_block)
        block = _sublane_block(block)
    batch_shape = np.broadcast_shapes(j.shape[1:], h.shape[1:])
    dtype = jnp.result_type(j, h)
    j = jnp.broadcast_to(j.astype(dtype), (j.shape[0], *batch_shape))
    h = jnp.broadcast_to(h.astype(dtype), (h.shape[0], *batch_shape))
    out = _jhj_cf(j.reshape(j.shape[0], -1), h.reshape(h.shape[0], -1),
                  d, block, bool(interpret), bool(bm))
    return _downcast(out.reshape(compact_size(d), *batch_shape), half)
