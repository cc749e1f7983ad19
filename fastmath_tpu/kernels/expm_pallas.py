"""Pallas TPU kernel: batched matrix exponential for tiny d.

The XLA scaling-and-squaring expm (:mod:`fastmath_tpu.ops.lie`) is a
chain of ~30 fused elementwise passes (Horner steps + masked
squarings), each streaming the whole batch through HBM — measured
~2.9e7 expm/s at 4x4/f32 on v5e, i.e. HBM-pass-bound. This kernel runs
the entire Taylor-Horner core and the per-lane masked squaring loop in
registers: one read + one write of the batch (128 B/item at d=4).

Layout: channel-first row-major full storage ``(d*d, ...)`` with entry
(i, j) on row ``i*d + j`` (same convention as
:mod:`.batched_pallas`). Reference analog: ``_impl/expm.py:15-49``
(Taylor series core).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sym_pallas import (DEFAULT_BLOCK, _call_rows, _interpret_default,
                         _sublane_block)

__all__ = ["expm_cf"]

_MAX_D = 8
_MAX_D_ROLLED = 32
_SQUARINGS_MAX = 20
_ORDER_F32 = 9
_ORDER_F64 = 16


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


def _mm_st(A, B, d):
    """Stacked-grid matmul ``C[i, j] = sum_k A[i, k] B[k, j]`` on
    ``(d, d, *lane)`` arrays: a static unroll of d rank-1 updates, each
    a full-grid FMA of broadcast column x row (the same
    static-leading-axis slicing + broadcast idiom as the rolled
    PLU/maxeig kernels — Mosaic has no dynamic indexing, and a
    one-shot ``(d, d, d, *lane)`` contraction would blow scoped VMEM
    at d = 16)."""
    shape = (d, d) + A.shape[2:]
    C = None
    for k in range(d):
        term = (jnp.broadcast_to(A[:, k][:, None], shape)
                * jnp.broadcast_to(B[k][None, :], shape))
        C = term if C is None else C + term
    return C


def _eye_st(d, lane, dt):
    ri = jax.lax.broadcasted_iota(jnp.int32, (d, d) + (1,) * len(lane), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (d, d) + (1,) * len(lane), 1)
    return jnp.broadcast_to((ri == ci).astype(dt), (d, d) + lane)


def _expm_rolled_kernel(d, order, mat_ref, out_ref):
    """Rolled (stacked-grid) scaling-and-squaring for 9 <= d <= 32:
    the same algebra as :func:`_expm_kernel` on a ``(d, d, *lane)``
    carry — O(d) traced ops per Horner step instead of the O(d^3)
    per-entry register ops the unrolled form would need (minutes of
    Mosaic compile at d = 16)."""
    lane = mat_ref[0].shape
    dt = mat_ref[0].dtype
    A = jnp.stack([mat_ref[r] for r in range(d * d)],
                  axis=0).reshape((d, d) + lane)
    eye = _eye_st(d, lane, dt)

    # 1-norm (max abs column sum) per lane -> squaring depth
    norm = jnp.max(jnp.sum(jnp.abs(A), axis=0), axis=0)
    s = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30) / 0.5)), 0,
        _SQUARINGS_MAX
    )
    Y = A * jnp.exp2(-s)[None, None]

    R = eye + Y / order
    for m in range(order - 1, 0, -1):
        R = eye + _mm_st(Y, R, d) / m

    s_max = jnp.max(s)

    def cond(carry):
        return carry[1] < s_max

    def body(carry):
        G, it = carry
        Sq = _mm_st(G, G, d)
        active = (it < s)[None, None]
        return jnp.where(active, Sq, G), it + 1

    G, _ = jax.lax.while_loop(cond, body, (R, jnp.zeros((), s.dtype)))
    for i in range(d):
        for j in range(d):
            out_ref[i * d + j] = G[i, j]


def _expm_kernel(d, order, mat_ref, out_ref):
    E = [[mat_ref[i * d + j] for j in range(d)] for i in range(d)]
    one = jnp.ones_like(E[0][0])
    zero = jnp.zeros_like(E[0][0])

    # 1-norm (max abs column sum) per lane
    norm = None
    for j in range(d):
        col = jnp.abs(E[0][j])
        for i in range(1, d):
            col = col + jnp.abs(E[i][j])
        norm = col if norm is None else jnp.maximum(norm, col)
    s = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30) / 0.5)), 0, _SQUARINGS_MAX
    )
    scale = jnp.exp2(-s)
    Y = [[E[i][j] * scale for j in range(d)] for i in range(d)]

    # Horner evaluation of the fixed-order Taylor polynomial
    eye = [[one if i == j else zero for j in range(d)] for i in range(d)]
    R = [[eye[i][j] + Y[i][j] / order for j in range(d)] for i in range(d)]
    for m in range(order - 1, 0, -1):
        P = _mm_grid(Y, R, d)
        R = [[eye[i][j] + P[i][j] / m for j in range(d)] for i in range(d)]

    # per-lane masked squaring; the loop exits at the block's max
    # squaring depth (typically 3-5 for unit-scale inputs) instead of
    # always paying the _SQUARINGS_MAX cap
    def flatten(G):
        return tuple(G[i][j] for i in range(d) for j in range(d))

    def unflatten(flat):
        return [[flat[i * d + j] for j in range(d)] for i in range(d)]

    s_max = jnp.max(s)

    def cond(carry):
        return carry[1] < s_max

    def body(carry):
        G = unflatten(carry[0])
        it = carry[1]
        Sq = _mm_grid(G, G, d)
        active = it < s
        return tuple(
            jnp.where(active, Sq[i][j], G[i][j])
            for i in range(d)
            for j in range(d)
        ), it + 1

    # counter carries the data dtype (a bare asarray(0.0) would become
    # f64 under jax_enable_x64 and fail the Mosaic lowering)
    flat, _ = jax.lax.while_loop(
        cond, body, (flatten(R), jnp.zeros((), s.dtype)))
    for r in range(d * d):
        out_ref[r] = flat[r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _expm_cf(mat, block, interpret, bm=False):
    d = int(round(np.sqrt(mat.shape[0])))
    order = _ORDER_F64 if jnp.finfo(mat.dtype).eps < 1e-10 else _ORDER_F32
    kern = functools.partial(
        _expm_kernel if d <= _MAX_D else _expm_rolled_kernel, d, order)
    # d > 16: ~6 live (d, d, block) stacked grids (A, eye, Y, R, G +
    # matmul temp) = ~24 MiB at d=32 x block 1024, over Mosaic's
    # 16 MiB default scoped-VMEM stack (cf. logm_cf's budget note)
    vmem = 64 * 1024 * 1024 if d > 16 else None
    return _call_rows(kern, (mat,), mat.shape[0], block, interpret,
                      bm=bm, vmem_limit=vmem)


def _expm_cf_fwd(mat, block, interpret, bm=False):
    return _expm_cf(mat, block, interpret, bm), mat


def _expm_cf_bwd(block, interpret, bm, mat, g):
    # VJP via the Mathias block trick: L_exp(X^T)[G] is the top-right
    # block of expm([[X^T, G], [0, X^T]]). For d <= 8 the 2d x 2d
    # block still fits a kernel tier (unrolled to 2d = 8, rolled to
    # 2d = 16), so the backward pass stays a one-memory-pass register
    # kernel too; beyond that it falls back to the XLA
    # scaling-and-squaring expm.
    d = int(round(np.sqrt(mat.shape[0])))
    # channel-first (d*d, B) -> batch-last (B, d, d)
    X = jnp.moveaxis(mat, 0, -1).reshape(*mat.shape[1:], d, d)
    G = jnp.moveaxis(g, 0, -1).reshape(*g.shape[1:], d, d)
    Xt = jnp.swapaxes(X, -1, -2)
    top = jnp.concatenate([Xt, G], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(Xt), Xt], axis=-1)
    blk_full = jnp.concatenate([top, bot], axis=-2)
    if 2 * d <= _MAX_D_ROLLED:
        if 2 * d <= _MAX_D:
            blk_block = min(block, 2048)
        elif interpret:
            blk_block = min(block, 1024)
        else:
            # rolled-tier block on real TPU: exactly the sublane-legal
            # 1024 (a caller's smaller forward block must not leak in)
            blk_block = 1024
        cf = jnp.moveaxis(
            blk_full.reshape(*blk_full.shape[:-2], 4 * d * d), 0, -1
        ).reshape(4 * d * d, -1)
        # bm=True: cf above is a lazy batch-major transpose, which
        # composes with the block-major repack (no global relayout)
        blk_cf = _expm_cf(cf, blk_block, interpret, True)
        blk = jnp.moveaxis(blk_cf, 0, -1).reshape(blk_full.shape)
    else:
        from ..ops.lie import _expm_core

        blk = _expm_core(blk_full)
    dX = blk[..., :d, d:]
    return (jnp.moveaxis(dX.reshape(*mat.shape[1:], d * d), -1, 0),)


_expm_cf.defvjp(_expm_cf_fwd, _expm_cf_bwd)


def expm_cf(
    mat: jnp.ndarray,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
    bm: bool = False,
) -> jnp.ndarray:
    """Channel-first batched matrix exponential ``(d*d, ...) ->
    (d*d, ...)`` (Pallas; row-major channels, d <= 32).

    Scaling-and-squaring with a fixed-order Taylor-Horner core and
    per-lane masked squaring depth, entirely in registers — one memory
    pass per batch. Differentiable (Mathias block-matrix VJP).
    d <= 8 unrolls the register grid per entry; 9 <= d <= 32 runs the
    same algebra rolled on stacked ``(d, d, *lane)`` grids
    (:func:`_expm_rolled_kernel` — O(1) Mosaic ops in d per Horner
    term). SoA tier of :func:`fastmath_tpu.ops.lie.expm` (reference
    ``_impl/expm.py:15-49``).

    VMEM note: the kernel keeps ~5 live d x d register grids, so its
    per-block footprint is ~5 x d^2 x block x 4 B on top of the
    double-buffered IO; ``block`` > 8192 OOMs the 16 MB scoped VMEM at
    d = 4 (unlike the leaner solve kernels, which take 32768) and the
    default shrinks to 2048 at 5 <= d <= 8 and 1024 for the rolled
    tier (the stacked-grid minimum: block/128 sublanes must be a
    multiple of 8).
    """
    mat = jnp.asarray(mat)
    d = int(round(np.sqrt(mat.shape[0])))
    if d * d != mat.shape[0] or d > _MAX_D_ROLLED:
        raise ValueError(
            f"expm_cf expects (d*d, ...) rows with d <= {_MAX_D_ROLLED}; "
            f"got {mat.shape[0]} channels"
        )
    if block is None:
        block = DEFAULT_BLOCK if d <= 4 else (2048 if d <= 8 else 1024)
    if not jnp.issubdtype(mat.dtype, jnp.floating):
        mat = mat.astype(jnp.result_type(float))
    if interpret is None:
        interpret = _interpret_default()
    if d > _MAX_D and not interpret:
        # stacked-grid sublane rule on real TPU (interpret mode has no
        # such constraint)
        block = _sublane_block(block)
    batch_shape = mat.shape[1:]
    out = _expm_cf(mat.reshape(mat.shape[0], -1), block, bool(interpret),
                   bool(bm))
    return out.reshape(mat.shape[0], *batch_shape)
