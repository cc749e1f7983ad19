"""Lie-group matrix functions: expm / logm / expm_derivatives / meanm.

Capability parity with the reference's ``lie`` module
(``nitorch_fastmath/lie.py`` + ``_impl/expm.py`` + ``_impl/logm.py``).

TPU-first design — the two big departures from the reference:

* ``expm`` uses **scaling-and-squaring** with a fixed-order Taylor core
  and *per-matrix masked squaring* (static shapes, fully batched, one
  fused XLA program) instead of the reference's adaptive whole-batch
  Taylor loop (``_impl/expm.py:190-212``). The reference itself notes
  "a faster integration technique, based e.g. on scaling and squaring,
  could have been used instead" (``_impl/expm.py:20-22``).
* ``logm`` replaces the reference's **per-matrix CPU scipy loop** — the
  worst device-boundary cliff in the library, one host round-trip per
  matrix (``_impl/logm.py:121-126``, SURVEY.md §3.4) — with a fully
  device-resident batched **inverse scaling-and-squaring**: masked
  Denman-Beavers square roots until each matrix is near identity, then
  an ``atanh``-form Gregory series, then multiply back by ``2^k``.

``expm`` is a plain differentiable jnp program (JAX AD gives exact
gradients); ``logm`` carries a custom VJP via the same Mathias
block-matrix chain rule the reference uses (``_impl/logm.py:12-59``),
evaluated batched on device instead of per-matrix on CPU.

Branch-cut contract (matches the reference, ``_impl/logm.py:76-83``):
for real input whose principal log is complex (eigenvalues on the
negative real axis — reflections, rotations by pi, negative scalings),
``logm`` returns the **real part of the complex principal log**, like
scipy real-cast. The fast real ISS path flags such matrices per-batch
and reroutes only those through an exceptional path: normal matrices
via joint Hermitian diagonalization (exact branch handling per
eigenvalue), non-normal ones via an imaginary spectral shift with a
series correction (accuracy ~1e-11 in f64, ~1e-4 in f32; documented).
Known ambiguity: inputs with complex eigenvalue *pairs* within ~1e-8
of the cut sit on a genuine discontinuity of the real-cast map — any
numerical method (scipy included) resolves them by rounding noise.
"""
from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from .sugar import lmdiv
from ..kernels.expm_pallas import _MAX_D_ROLLED as _EXPM_PALLAS_MAX_D

__all__ = ["expm", "logm", "meanm", "expm_derivatives"]

_SQUARINGS_MAX = 20  # handles ||X|| up to ~2^20 * 0.5
_ISS_STEPS_MAX = 12  # inverse-scaling steps for logm
_DB_ITERS = 36  # Denman-Beavers iteration cap per square root
_LOGM_SYM_EIG_MAX_D = 32  # symmetric eig route cap = rolled Jacobi tier
# Lower bound of the symmetric eig route: TPU-measured crossover vs the
# logm register kernel (probe r4) — route 2.0e6 vs kernel 1.4e6 logm/s
# at d=12, 1.6e6 vs 5.4e5 at d=16, 7.2e5 vs ~1.8e5 at d=24. Below 12
# the kernel wins outright (2.7e7/s at d=8).
_LOGM_SYM_EIG_MIN_D = 12


def _taylor_order(dtype) -> int:
    # truncation error theta^(m+1)/(m+1)! at theta = 0.5
    return 16 if jnp.finfo(dtype).eps < 1e-10 else 9


def _expm_core(X: jnp.ndarray) -> jnp.ndarray:
    """Batched scaling-and-squaring expm of ``(..., d, d)``."""
    d = X.shape[-1]
    eye = jnp.eye(d, dtype=X.dtype)
    # 1-norm (max abs column sum) per matrix
    norm = jnp.max(jnp.sum(jnp.abs(X), axis=-2), axis=-1)
    s = jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-300) / 0.5))
    s = jnp.clip(s, 0, _SQUARINGS_MAX)
    Y = X * (2.0 ** -s)[..., None, None]
    from .batched import batchmatmul as mm  # unrolled for tiny d (TPU)
    # Horner evaluation of the fixed-order Taylor polynomial
    order = _taylor_order(X.dtype)
    E = eye + Y / order
    for m in range(order - 1, 0, -1):
        E = eye + mm(Y, E) / m
    # per-matrix masked squaring: matrix i squares exactly s_i times
    def body(i, E):
        return jnp.where((i < s)[..., None, None], mm(E, E), E)

    return jax.lax.fori_loop(0, _SQUARINGS_MAX, body, E)


def _reconstruct_log(X, basis):
    """Combine coefficients with a basis: ``sum_i x_i B_i``."""
    X = jnp.asarray(X)
    basis = jnp.asarray(basis)
    return jnp.sum(basis * X[..., None, None], axis=-3)


def expm(X, basis=None, max_order: int = 10000, tol: float = 1e-32,
         backend: str = "auto"):
    """Matrix exponential (batched, differentiable).

    ``X``: log-matrix ``(..., D, D)``, or coefficients ``(..., F)`` when
    ``basis`` ``(..., F, D, D)`` is given (Lie-algebra parameterization,
    reference ``_impl/expm.py:15-49``). ``max_order``/``tol`` are
    accepted for API compatibility; the scaling-and-squaring core makes
    them unnecessary (accuracy is at working precision by construction).

    ``backend``: ``"auto"`` routes real d <= 32 input to the one-pass
    Pallas register kernel on TPU (:func:`fastmath_tpu.kernels.expm_cf`;
    5 <= d <= 8 runs the same Taylor-Horner core on larger register
    grids, 9 <= d <= 32 rolls it on stacked grids);
    ``"pallas"`` / ``"xla"`` force a path. The Pallas path
    carries a custom VJP (reverse-mode only); for forward-mode AD
    (``jax.jvp`` / ``jacfwd``) use ``backend="xla"`` or
    :func:`expm_derivatives`.
    """
    if basis is not None:
        X = _reconstruct_log(X, basis)
    X = jnp.asarray(X)
    if not jnp.issubdtype(X.dtype, jnp.floating) and not jnp.issubdtype(
        X.dtype, jnp.complexfloating
    ):
        X = X.astype(jnp.result_type(float))
    d = X.shape[-1]
    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown backend {backend!r}")
    pallas_ok = d <= _EXPM_PALLAS_MAX_D and not jnp.issubdtype(
        X.dtype, jnp.complexfloating)
    if backend == "pallas" and not pallas_ok:
        raise ValueError(
            "backend='pallas' requires real input with "
            f"d <= {_EXPM_PALLAS_MAX_D}")
    if backend == "pallas" or (
        backend == "auto" and pallas_ok and jax.default_backend() == "tpu"
        # Mosaic has no f64: auto keeps x64-on-TPU data on XLA
        and float(jnp.finfo(X.dtype).eps) > 1e-10
    ):
        from ..kernels.expm_pallas import expm_cf

        # lazy batch-major transpose composes with the kernel's
        # block-major repack (bm=True) — no separate relayout pass
        cf = jnp.moveaxis(X.reshape(*X.shape[:-2], d * d), -1, 0)
        out = expm_cf(cf, bm=True)
        return jnp.moveaxis(out, 0, -1).reshape(X.shape)
    return _expm_core(X)


def _expm_derivatives_taylor(coefs, basis_arr, grad_X, grad_basis,
                             hess_X, max_order, tol):
    """One-pass coupled Taylor recursion for ``expm_derivatives`` —
    value, ∂/∂coefs, ∂/∂basis and the coefficient Hessian accumulate
    together, one order per ``lax.while_loop`` step (the reference's
    scheme, ``_impl/expm.py:190-212``, re-expressed as a fori-style
    device loop over broadcast-batched tiny matmuls):

    ``E_n = E_{n-1} X / n``, ``dE_n = (dE_{n-1} X + E_{n-1} B) / n``,
    ``dB_n`` likewise against the coefficient-scaled one-hot
    basis-of-basis, and ``hE_n = (hE_{n-1} X + dEB + dEB^T) / n`` with
    ``dEB[f, g] = dE_{n-1}[f] B[g]``. Exits on the Frobenius
    sum-of-squares of the value term (reference's criterion) or
    ``max_order``. Like the reference, plain Taylor: accurate for the
    Lie-algebra regime (||X|| <~ a few); for large-norm logs use the
    jacfwd path, whose scaling-and-squaring core is norm-safe.
    """
    X = jnp.sum(basis_arr * coefs[..., None, None], axis=-3)
    d = X.shape[-1]
    f = basis_arr.shape[-3]
    dt = X.dtype
    batch = X.shape[:-2]
    from .batched import batchmatmul as _bmm

    eye = jnp.eye(d, dtype=dt)
    B = jnp.broadcast_to(basis_arr, batch + (f, d, d))
    Xb = X[..., None, :, :]  # (..., 1, D, D) broadcasts over F
    state = {"E": eye + X, "En": X}
    if grad_X or hess_X:
        state["dE"] = B
        state["dEn"] = B
    if grad_basis:
        # basis-of-basis: d X / d B_f[k, l] = c_f e_k e_l^T — the
        # coefficient-scaled one-hot stack (reference :166-173)
        bb = jnp.eye(d * d, dtype=dt).reshape(d * d, d, d)
        BB = coefs[..., :, None, None, None] * bb
        BB = BB.reshape(batch + (f * d * d, d, d))
        state["dB"] = BB
        state["dBn"] = BB
    if hess_X:
        z = jnp.zeros(batch + (f, f, d, d), dt)
        state["hE"] = z
        state["hEn"] = z
    keys = sorted(state)
    numel = 1.0
    for s_ in X.shape:
        numel *= float(s_)

    def cond(carry):
        n, sos = carry[0], carry[1]
        return (n <= max_order) & (sos > numel * tol)

    def body(carry):
        n, _, vals = carry
        s = dict(zip(keys, vals))
        nn = n.astype(dt)
        if hess_X:
            dEB = _bmm(s["dEn"][..., :, None, :, :],
                       B[..., None, :, :, :])
            s["hEn"] = (_bmm(s["hEn"], Xb[..., None, :, :]) + dEB
                        + jnp.swapaxes(dEB, -3, -4)) / nn
            s["hE"] = s["hE"] + s["hEn"]
        if grad_X or hess_X:
            s["dEn"] = (_bmm(s["dEn"], Xb) + _bmm(
                s["En"][..., None, :, :], B)) / nn
            s["dE"] = s["dE"] + s["dEn"]
        if grad_basis:
            s["dBn"] = (_bmm(s["dBn"], Xb) + _bmm(
                s["En"][..., None, :, :], state["dB"])) / nn
            s["dB"] = s["dB"] + s["dBn"]
        s["En"] = _bmm(s["En"], X) / nn
        s["E"] = s["E"] + s["En"]
        sos = jnp.sum(s["En"].astype(jnp.float32) ** 2
                      if dt == jnp.bfloat16 else s["En"] ** 2)
        return n + 1, sos.astype(jnp.result_type(float)), tuple(
            s[k] for k in keys)

    inf = jnp.asarray(jnp.inf, jnp.result_type(float))
    _, _, vals = jax.lax.while_loop(
        cond, body, (jnp.asarray(2), inf, tuple(state[k] for k in keys)))
    s = dict(zip(keys, vals))
    out = [s["E"]]
    if grad_X:
        out.append(s["dE"])
    if grad_basis:
        out.append(s["dB"].reshape(batch + (f, d, d, d, d)))
    if hess_X:
        out.append(s["hE"])
    return out[0] if len(out) == 1 else tuple(out)


def expm_derivatives(
    X,
    basis=None,
    grad_X: bool = False,
    grad_basis: bool = False,
    hess_X: bool = False,
    max_order: int = 10000,
    tol: float = 1e-32,
    method: str = "auto",
):
    """Matrix exponential and its derivatives w.r.t. the Lie-algebra
    parameterization.

    Returns ``E (..., D, D)`` plus, in order, when requested:
    ``dX (..., F, D, D)`` (derivative w.r.t. coefficients),
    ``dB (..., F, D, D, D, D)`` (derivative w.r.t. the basis),
    ``hX (..., F, F, D, D)`` (Hessian w.r.t. coefficients).

    ``method``: ``"taylor"`` accumulates everything in ONE coupled
    Taylor recursion (:func:`_expm_derivatives_taylor` — the
    reference's scheme, ``_impl/expm.py:190-212``, one device loop
    instead of O(F^2) forward passes); ``"jacfwd"`` takes exact
    forward-mode derivatives of the scaling-and-squaring ``expm``
    (norm-safe, and the only differentiable-through path).
    ``"auto"`` = taylor, the measured winner at the SE(3) F=6 gate
    (BENCH_MEASURED.md expm_derivatives row), unless the request is
    derivative-free (plain ``expm`` is strictly better) — for
    large-norm logs (||X|| >> 1, outside the Lie-algebra regime) pass
    ``method="jacfwd"``. Reference analog: ``_impl/expm.py:52-225``.
    """
    if basis is None:
        # one-hot basis over all D*D entries (reference :148-156)
        X = jnp.asarray(X)
        d = X.shape[-1]
        coefs = X.reshape(*X.shape[:-2], d * d)
        basis_arr = jnp.eye(d * d, dtype=X.dtype).reshape(d * d, d, d)
    else:
        coefs = jnp.asarray(X)
        basis_arr = jnp.asarray(basis)
    if not jnp.issubdtype(coefs.dtype, jnp.inexact):
        coefs = coefs.astype(jnp.result_type(float))
    if basis_arr.dtype != coefs.dtype:
        basis_arr = basis_arr.astype(jnp.result_type(
            coefs.dtype, basis_arr.dtype))
        coefs = coefs.astype(basis_arr.dtype)
    d = basis_arr.shape[-1]
    f = coefs.shape[-1]
    if method not in ("auto", "taylor", "jacfwd"):
        raise ValueError(f"unknown method {method!r}")
    any_grad = grad_X or grad_basis or hess_X
    if method == "taylor" or (method == "auto" and any_grad):
        return _expm_derivatives_taylor(
            coefs, basis_arr, grad_X, grad_basis, hess_X, max_order, tol)

    def fn(c, b):
        # per-sample: c (F,), b (F, D, D)
        return _expm_core(jnp.sum(b * c[..., None, None], axis=-3))

    # jacfwd differentiates w.r.t. the WHOLE argument — on batched
    # coefs that would produce (and misshape) cross-batch zeros, so
    # flatten the broadcast batch and vmap the per-sample jacobian
    # (round-5 fix; the taylor path batches natively)
    batch = jnp.broadcast_shapes(coefs.shape[:-1], basis_arr.shape[:-3])
    nb = 1
    for s_ in batch:
        nb *= int(s_)
    cb = jnp.broadcast_to(coefs, batch + (f,)).reshape(nb, f)
    bb = jnp.broadcast_to(basis_arr, batch + (f, d, d)).reshape(
        nb, f, d, d)

    def unbatch(y, trailing):
        return y.reshape(batch + trailing)

    E = unbatch(jax.vmap(fn)(cb, bb), (d, d))
    out = [E]
    if grad_X:
        jac = jax.vmap(jax.jacfwd(fn, argnums=0))(cb, bb)
        # jacfwd appends input dims; move the F axis in front of (D, D)
        out.append(unbatch(jnp.moveaxis(jac, -1, -3), (f, d, d)))
    if grad_basis:
        jb = jax.vmap(jax.jacfwd(fn, argnums=1))(cb, bb)
        # jac[i, j, f, k, l] = dE_ij / dB_fkl -> layout (f, k, l, i, j)
        # (the reference's dB convention; the old (-3,-2,-1)->(-5,-2,-1)
        # mapping produced (f, i, j, k, l) — caught by FD in round 5)
        dB = jnp.moveaxis(jb, (-5, -4), (-2, -1))
        out.append(unbatch(dB, (f, d, d, d, d)))
    if hess_X:
        hj = jax.vmap(jax.jacfwd(jax.jacfwd(fn, argnums=0), argnums=0))(
            cb, bb)
        # (N, D, D, F, F) -> (N, F, F, D, D)
        out.append(unbatch(jnp.moveaxis(hj, (-2, -1), (-4, -3)),
                           (f, f, d, d)))
    return out[0] if len(out) == 1 else tuple(out)


def _inv_small(M: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse for the ISS/Denman-Beavers inner loops:
    closed-form adjugate for d <= 4, unrolled pivoted LU for d <= 8
    (both far faster on TPU than the blocked path and fully fused),
    ``jnp.linalg.inv`` beyond.

    Routing the d = 25..32 inverses through the rolled Pallas PLU was
    tried (round 4) and measured a 4x LOSS for the whole ISS at d=28
    (1.5e3 vs 6.7e3 logm/s): each ``while_loop`` iteration pays two
    non-fusible HBM relayouts (batch-major <-> channel-first) around
    the kernel, which swamps the kernel's own 14-26x win over XLA's
    blocked inverse. Symmetric batches never get here (the sym-eig
    route serves them); the non-normal d > 24 tier keeps XLA."""
    if M.shape[-1] <= 8:
        from .batched import batchinv

        return batchinv(M)
    return jnp.linalg.inv(M)


def _sqrtm_db(
    A: jnp.ndarray, iters: int = _DB_ITERS, scaled: bool = False
) -> jnp.ndarray:
    """Principal square root by the product-form Denman-Beavers
    iteration (one batched inverse per step), real or complex batches.

    Numerical refinements over the textbook form:

    * the M-update is evaluated as ``M <- 1/4 M^-1 (M + I)^2`` —
      algebraically identical to ``1/2 (I + (M + M^-1)/2)`` but
      cancellation-free when M has eigenvalues near -1 (the
      ``M + M^-1`` form loses the O(dist-to-cut^2) information to
      roundoff there);
    * the batch-global ``while_loop`` convergence test excludes
      non-finite lanes, so one singular/divergent matrix cannot freeze
      or early-exit the whole batch (its lanes stay NaN and are flagged
      downstream);
    * ``scaled=True`` adds determinant scaling (Higham 2008 §6.5) for
      near-uniform convergence. It is ONLY safe when the spectrum is
      known to be bounded away from the negative real axis (the
      imaginary-shift route): on exactly-on-cut eigenvalues, scaling
      can converge to a non-principal branch *silently*, whereas the
      unscaled iteration diverges to NaN — which is the signal the
      public ``logm`` uses to reroute those matrices.
    """
    d = A.shape[-1]
    eye = jnp.eye(d, dtype=A.dtype)
    from .batched import batchdet, batchmatmul as mm

    tol = float(jnp.finfo(A.dtype).eps) * d * 4

    def cond(carry):
        M, Y, it = carry
        d2 = jnp.sum(jnp.abs(M - eye) ** 2, axis=(-2, -1))
        active = jnp.isfinite(d2) & (d2 > tol * tol)
        return (it < iters) & jnp.any(active)

    def body(carry):
        M, Y, it = carry
        if scaled:
            det = jnp.abs(batchdet(M))
            safe = jnp.isfinite(det) & (det > 0)
            mu2 = jnp.where(safe, det, 1.0) ** (-1.0 / d)
            mu2 = jnp.where(safe, mu2, 1.0)[..., None, None]
        else:
            mu2 = 1.0
        Minv = _inv_small(M)
        T = mu2 * M + eye
        Y = (0.5 / jnp.sqrt(mu2)) * mm(mm(Y, Minv), T)
        M = (0.25 / mu2) * mm(Minv, mm(T, T))
        return M, Y, it + 1

    M, Y, _ = jax.lax.while_loop(cond, body, (A, A, jnp.asarray(0)))
    # per-matrix convergence: a lane that hit the iteration cap mid-air
    # must NOT be mistaken for a square root (on-cut eigenvalues bounce
    # forever; accepting the non-converged Y would let a later ISS step
    # land near I with a wrong branch). NaN it so failure propagates.
    d2 = jnp.sum(jnp.abs(M - eye) ** 2, axis=(-2, -1))
    conv = jnp.isfinite(d2) & (d2 <= (8 * tol) ** 2)
    return jnp.where(conv[..., None, None], Y, jnp.nan * Y)


def _iss_log_core(A, scaled: bool = False):
    """Shared inverse-scaling-and-squaring + Gregory-series logm core
    (real or complex batches). Returns ``(L, ok)`` where ``ok`` flags,
    per matrix, that the masked square-root chain actually reached the
    series' convergence region — matrices with eigenvalues on the
    negative real axis (no principal square-root chain) come back
    ``ok=False`` instead of silently wrong.

    Accuracy: the chain tracks ``D = A_k - I`` *without cancellation*
    via the exact identity ``A_k - I = (A_{k-1} - I)(A_k + I)^{-1}``
    (the incomplete-square-root recurrence of Al-Mohy & Higham 2012,
    "Improved inverse scaling and squaring algorithms for the matrix
    logarithm", re-derived for the Denman-Beavers chain). Subtracting
    I from the computed ``A_k ~ I + X/2^k`` directly would lose
    ``~k + log2(1/||X||)`` bits and was the dominant f32 error term
    (round-2 p99 6.5e-5, VERDICT item 9); the tracked form keeps the
    relative error of ``D`` at O(eps) per step.
    """
    d = A.shape[-1]
    eye = jnp.eye(d, dtype=A.dtype)
    rdt = jnp.finfo(A.dtype).dtype  # real counterpart of A.dtype
    thresh = 0.25
    from .batched import batchmatmul as mm  # unrolled for tiny d (TPU)

    def dist2(M):
        return jnp.sum(jnp.abs(M - eye) ** 2, axis=(-2, -1))

    def cond(carry):
        A, D, k, it = carry
        d2 = dist2(A)
        active = jnp.isfinite(d2) & (d2 > thresh * thresh)
        return (it < _ISS_STEPS_MAX) & jnp.any(active)

    def body(carry):
        A, D, k, it = carry
        d2 = dist2(A)
        need = jnp.isfinite(d2) & (d2 > thresh * thresh)
        As = _sqrtm_db(A, scaled=scaled)
        # cancellation-free difference update: D <- D (As + I)^{-1}
        Ds = mm(D, _inv_small(As + eye))
        nd = need[..., None, None]
        A = jnp.where(nd, As, A)
        D = jnp.where(nd, Ds, D)
        k = k + need.astype(rdt)
        return A, D, k, it + 1

    k0 = jnp.zeros(A.shape[:-2], dtype=rdt)
    # while_loop: stop as soon as every finite matrix is within
    # `thresh` of I (per-matrix depth still tracked in k; non-finite
    # lanes are excluded so they cannot stall or early-exit the batch)
    A, D, k, _ = jax.lax.while_loop(
        cond, body, (A, A - eye, k0, jnp.asarray(0))
    )
    d2 = dist2(A)
    ok = jnp.isfinite(d2) & (d2 <= thresh * thresh)

    # log(A) = 2 * atanh(Z) with Z = (A - I)(A + I)^{-1}, ||Z|| small;
    # A - I is the accurately-tracked D
    Z = mm(D, _inv_small(A + eye))
    Z2 = mm(Z, Z)
    order = 21 if jnp.finfo(A.dtype).eps < 1e-10 else 9
    acc = eye / order
    for m in range(order - 2, 0, -2):
        acc = eye / m + mm(Z2, acc)
    L = 2.0 * mm(Z, acc) * (2.0**k)[..., None, None]
    ok = ok & jnp.all(jnp.isfinite(L), axis=(-2, -1))
    return L, ok


def _logm_exceptional(A):
    """Branch-cut-capable batched logm for matrices the real/plain ISS
    path cannot handle (eigenvalues on the negative real axis). Input
    may be real or complex; output is the complex principal log (the
    caller real-casts for real input, reference ``_impl/logm.py:81-83``).

    Two per-matrix routes, selected by a normality test:

    * **normal** (rotations, reflections, symmetric/skew — the SE(3)
      workload): joint diagonalization. For normal ``A``,
      ``C = H + i*t*K`` with ``H = (A + A^H)/2``, ``K = (A - A^H)/2``
      is Hermitian and shares A's eigenvectors, so one batched
      Hermitian Jacobi eigendecomposition recovers them; each
      eigenvalue's principal log is then exact (atan2 branch). ``t``
      is an irrational-ish constant so members of a conjugate pair
      split (their K-parts differ in sign); *distinct* eigenvalues can
      still collide in C when ``Re l1 + t Im l1 == Re l2 + t Im l2``
      (eigenspace mixing), so the route is accepted per matrix only
      when its reconstruction ``V diag(lam) V^H`` matches ``A`` —
      collisions fall through to the shift route, which handles normal
      matrices too (just at ~1e-11 instead of ~1e-15).
    * **non-normal**: imaginary spectral shift ``B = A + i*delta*I``
      (moves on-cut eigenvalues onto the principal side), complex ISS,
      then the exact commuting-series correction
      ``log B - sum_k (-1)^{k+1} (i*delta)^k A^{-k} / k`` (k <= 4),
      leaving O(delta^5 + eps/delta^2) error — ~1e-11 in f64.
    """
    d = A.shape[-1]
    cdt = jnp.result_type(A.dtype, jnp.complex64)
    rdt = jnp.finfo(cdt).dtype
    from .batched import batchmatmul as mm

    Ah = jnp.swapaxes(jnp.conj(A), -1, -2)
    comm = mm(A, Ah) - mm(Ah, A)
    c2 = jnp.sum(jnp.abs(comm) ** 2, axis=(-2, -1))
    a2 = jnp.sum(jnp.abs(A) ** 2, axis=(-2, -1))
    eps = float(jnp.finfo(rdt).eps)
    is_normal = c2 <= (64 * eps) ** 2 * a2**2

    Ac = A.astype(cdt)

    # (a) normal route: joint Hermitian diagonalization
    t = 0.7390851332151607
    C = (0.5 * (A + Ah)).astype(cdt) + (1j * t) * (0.5 * (A - Ah)).astype(cdt)
    from .qr import eig_sym

    _, V = eig_sym(C, compute_u=True, check_finite=False, backend="xla")
    # precision="highest": a default-precision einsum on TPU runs bf16
    # MXU passes (~1e-3 relative) — the same trap that floored meanm
    lam = jnp.einsum("...ij,...ij->...j", jnp.conj(V), mm(Ac, V),
                     precision="highest")
    Ln = jnp.einsum(
        "...ik,...k,...jk->...ij", V, jnp.log(lam), jnp.conj(V),
        precision="highest"
    )
    # accept the diagonalization only where it actually reproduces A
    # (guards the Re+t*Im eigenvalue-collision case, where V mixes
    # distinct eigenspaces and the reconstruction visibly fails)
    recon = jnp.einsum("...ik,...k,...jk->...ij", V, lam, jnp.conj(V),
                       precision="highest")
    r2 = jnp.sum(jnp.abs(recon - Ac) ** 2, axis=(-2, -1))
    diag_ok = r2 <= (64 * eps) ** 2 * jnp.maximum(a2, 1e-30)

    # (b) shift route
    delta0 = 5e-4 if eps < 1e-10 else 2e-2
    norm1 = jnp.max(jnp.sum(jnp.abs(A), axis=-2), axis=-1)
    dl = (delta0 * jnp.maximum(norm1, 1e-30)).astype(rdt)
    eye = jnp.eye(d, dtype=cdt)
    B = Ac + (1j * dl)[..., None, None] * eye
    Ls, oks = _iss_log_core(B, scaled=True)
    R1 = _inv_small(Ac)
    R2 = mm(R1, R1)
    e = (1j * dl)[..., None, None]
    bracket = e * R1 - (e**2 / 2) * R2 + (e**3 / 3) * mm(R2, R1) \
        - (e**4 / 4) * mm(R2, R2)
    Lsh = Ls - bracket
    nan = jnp.asarray(jnp.nan, cdt) * (1 + 1j)
    Lsh = jnp.where(oks[..., None, None], Lsh, nan)

    return jnp.where((is_normal & diag_ok)[..., None, None], Ln, Lsh)


def _logm_sym_eig(A):
    """Symmetric-input log via the rolled Jacobi eig kernel — exactly
    the real-cast principal log for real symmetric input (V real
    orthogonal, so the imaginary part ``pi * V 1_{w<0} V^T`` is what
    real-casting discards). Serves symmetric batches at 12 <= d <= 32:
    TPU-measured it beats the logm register kernel from d=12 up (1.4x
    at 12, 3x at 16, 4x at 24 — probe r4), and past the kernel's d=24
    Mosaic-compile cap it closes the ~40x d=25..32 cliff to the XLA
    ISS tier (VERDICT r3 missing #2). Returns ``(L, ok)``; singular
    input (some eigenvalue == 0) comes back non-finite, ok=False.

    Accuracy: a plain ``V log|w| V^T`` recombination inherits the f32
    Jacobi floor — measured at d=28: V loses orthogonality at ~1e-5
    (sqrt(#rotations) * eps accumulation) and the worst lanes' residual
    ``off(V^T A V)`` stalls at ~1e-4 * ||A||_F (f32 drift between the
    iterated matrix and the accumulated V; more sweeps change nothing).
    Two cheap corrections (6 matmuls total, trivial vs the eig) push
    both to second order:

    * one Newton-Schulz polish ``V <- V (3I - V^T V) / 2`` squares the
      orthogonality error away (1e-5 -> ~1e-9);
    * the exact diagonal + first-order off-diagonal **Daleckii-Krein**
      term of ``log`` at ``M = V^T A V``: ``log(M)_ij ~= delta_ij
      log|m_i| + E_ij * (log|m_i| - log|m_j|)/(m_i - m_j)`` — absorbs
      the residual off-diagonal ``E`` to O(||E||^2) ~ 1e-8 instead of
      dropping it (O(||E||) ~ 1e-4).

    Measured (d=28 SPD, f32): normwise err 1.3e-4 -> <= 1.5e-6.
    """
    from .batched import batchmatmul as _bmm

    As = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    # polish=False: this route carries its own NS + Daleckii-Krein
    # correction below (log-specific divided differences) — eig_sym's
    # generic auto-polish would just duplicate the 6 matmuls
    _, V = _lie_eig_sym(As, compute_u=True, check_finite=False,
                        polish=False)
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    # recombination matmuls via batchmatmul — at d >= 12 that is XLA
    # dot_general at precision="highest" (the Pallas matmul tier
    # measured 1.5-4.7x SLOWER than dot_general on v5e and auto never
    # routes to it; an earlier draft that did cost this route 3x)
    Vt = jnp.swapaxes(V, -1, -2)
    vtv = _bmm(Vt, V)
    V = _bmm(V, 1.5 * eye - 0.5 * vtv)
    M = _bmm(_bmm(jnp.swapaxes(V, -1, -2), As), V)
    m = jnp.diagonal(M, axis1=-2, axis2=-1)
    # core.accmath.log, not jnp.log: XLA TPU's f32 log is ~4000 ulp
    # worst-case (measured round 4) — it alone floors this route at
    # ~3.4e-5 normwise; the accurate log restores ~1e-6-class
    from ..core.accmath import log as _acclog

    logm_d = _acclog(jnp.abs(m))
    mi, mj = m[..., :, None], m[..., None, :]
    li, lj = logm_d[..., :, None], logm_d[..., None, :]
    den = mi - mj
    # divided difference of log|.|: (log|mi| - log|mj|)/(mi - mj),
    # limit 2/(mi + mj) for near-equal same-sign pairs (the cutoff's
    # cancellation error only multiplies the already-small E)
    near = jnp.abs(den) <= 1e-3 * (jnp.abs(mi) + jnp.abs(mj))
    dd = jnp.where(near, 2.0 / jnp.where(near, mi + mj, 1.0),
                   (li - lj) / jnp.where(near, 1.0, den))
    Lm = logm_d[..., :, None] * eye + (M - m[..., :, None] * eye) * dd
    L = _bmm(_bmm(V, Lm), jnp.swapaxes(V, -1, -2))
    ok = jnp.all(jnp.isfinite(L), axis=(-2, -1))
    return L, ok


def _lie_eig_sym(*args, **kw):
    from .qr import eig_sym

    return eig_sym(*args, **kw)


def _on_tpu():
    """Routing gate for the native tiers (module-level so tests can
    exercise the TPU-only branches on CPU without patching
    ``jax.default_backend`` globally, which would also flip the
    kernels' interpret-mode detection)."""
    return jax.default_backend() == "tpu"


def _symmetric_mask(A):
    """Per-lane round-off symmetry test (same tolerance style as the
    normality test in :func:`_logm_exceptional`)."""
    d2 = jnp.sum((A - jnp.swapaxes(A, -1, -2)) ** 2, axis=(-2, -1))
    a2 = jnp.sum(A * A, axis=(-2, -1))
    eps = float(jnp.finfo(A.dtype).eps)
    return d2 <= (64 * eps) ** 2 * jnp.maximum(a2, 1e-300)


def _logm_plain(mat, sym_route: bool = True):
    """The regular-case batched log: register kernel (d <= 24 on TPU)
    or device ISS, NO exceptional-branch rescue. Returns ``(L, ok)``
    with non-converged / branch-cut lanes NaN and ``ok`` False.
    :func:`meanm` iterates on this directly: the rescue's ``lax.cond``
    turns into a both-branches select under ``vmap``/``while_loop``
    (~100x the regular path per iteration), and the reference's
    ``meanm`` treats complex projections as divergence anyway
    (``lie.py:80-82``).

    ``sym_route=False`` disables the data-dependent symmetric eig
    route: :func:`meanm` passes it because (a) its logm operand
    ``mean^{-1} mat`` is generically non-symmetric, and (b) under its
    ``while_loop`` the route's ``lax.cond`` would become a
    both-branches select, paying eig + fallback every iteration."""
    A = jnp.asarray(mat)
    if not jnp.issubdtype(A.dtype, jnp.floating) and not jnp.issubdtype(
        A.dtype, jnp.complexfloating
    ):
        A = A.astype(jnp.result_type(float))
    d = A.shape[-1]
    is_complex = jnp.issubdtype(A.dtype, jnp.complexfloating)
    from ..kernels.logm_pallas import _MAX_D_FLAT as _LOGM_KERNEL_MAX_D

    def _kernel(M):
        # one-memory-pass register kernel (kernels/logm_pallas.py);
        # non-converged lanes come back NaN and are rescued below
        from ..kernels.logm_pallas import logm_cf

        cf = jnp.moveaxis(M.reshape(*M.shape[:-2], d * d), -1, 0)
        out = logm_cf(cf, bm=True)
        L = jnp.moveaxis(out, 0, -1).reshape(M.shape)
        return L, jnp.all(jnp.isfinite(L), axis=(-2, -1))

    use_sym_route = (
        sym_route
        and not is_complex
        and _LOGM_SYM_EIG_MIN_D <= d <= _LOGM_SYM_EIG_MAX_D
        and _on_tpu()
    )
    if use_sym_route:
        # 12 <= d <= 32: symmetric batches (this library's main diet)
        # take V.log|w|.V^T through the rolled Jacobi eig tier — the
        # TPU-measured crossover vs the logm register kernel is d=12
        # (1.4x), growing to 3x at d=16 and 4x at d=24. Whole-batch
        # data-dependent split: an all-symmetric batch runs only the
        # eig route; any asymmetric lane sends the whole batch to the
        # fallback (ISS register kernel: nested form through d=24,
        # flat-loop form 25..32 — VERDICT r4 missing #1; documented in
        # docs/md/performance.md).
        fallback = (_kernel if d <= _LOGM_KERNEL_MAX_D
                    and float(jnp.finfo(A.dtype).eps) > 1e-10
                    else _iss_log_core)
        L, ok = jax.lax.cond(
            jnp.all(_symmetric_mask(A)),
            lambda: _logm_sym_eig(A),
            lambda: fallback(A),
        )
    elif (not is_complex and d <= _LOGM_KERNEL_MAX_D and _on_tpu()
          and float(jnp.finfo(A.dtype).eps) > 1e-10):
        # single-precision only: Mosaic has no f64 — x64-on-TPU data
        # keeps the XLA ISS tier (same contract, reference precision)
        L, ok = _kernel(A)
    else:
        L, ok = _iss_log_core(A)
    return L, ok


def _logm_impl(mat):
    A = jnp.asarray(mat)
    if not jnp.issubdtype(A.dtype, jnp.floating) and not jnp.issubdtype(
        A.dtype, jnp.complexfloating
    ):
        A = A.astype(jnp.result_type(float))
    is_complex = jnp.issubdtype(A.dtype, jnp.complexfloating)
    L, ok = _logm_plain(A)
    bad = ~ok

    def rescue():
        Lx = _logm_exceptional(A)
        if not is_complex:
            Lx = jnp.real(Lx)
        return jnp.where(bad[..., None, None], Lx, L)

    # data-dependent: the exceptional path only executes when some
    # matrix actually sits on the branch cut (under vmap this becomes
    # a select — both paths run — but top-level/jit calls pay nothing)
    return jax.lax.cond(jnp.any(bad), rescue, lambda: L)


@jax.custom_vjp
def logm(mat):
    """Batched, device-resident matrix logarithm via inverse scaling and
    squaring (masked per-matrix square-root depth + atanh Gregory
    series). Replaces the reference's per-matrix scipy/CPU loop
    (``_impl/logm.py:102-129``).

    Real inputs whose principal log is complex (eigenvalues on the
    negative real axis) return the **real part of the complex principal
    log**, matching the reference's scipy real-cast
    (``_impl/logm.py:81-83``); complex inputs return the complex
    principal log. Only the affected matrices pay for the exceptional
    path (see module docstring and :func:`_logm_exceptional`).

    Differentiable via the Mathias block-matrix chain rule (the
    reference's ``matrix_chain_rule``, ``_impl/logm.py:12``): the VJP
    is the top-right block of ``logm([[A^T, G], [0, A^T]])`` — the
    Frechet derivative of log at ``A^T`` applied to the cotangent.

    float32 accuracy contract (measured, 1M-batch 4x4 expm/logm
    roundtrip, ``BENCH_MEASURED.md``): elementwise rel-err median
    ~1e-7, **p99 <= 2e-5** — the tail sits slightly over the 1e-5
    class because the Gregory series' final multiply-back by ``2^k``
    amplifies the last rounding step; use float64 (``jax_enable_x64``)
    for 1e-11-class tails. The exceptional branch-cut path documents
    its own bound above (~1e-4 in f32 for non-normal input).
    """
    return _logm_impl(mat)


def _logm_fwd(mat):
    A = jnp.asarray(mat)
    return _logm_impl(A), A


def _logm_bwd(A, g):
    d = A.shape[-1]
    At = jnp.swapaxes(A, -1, -2).astype(g.dtype)
    top = jnp.concatenate([At, g], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(A).astype(g.dtype), At], axis=-1)
    blk = jnp.concatenate([top, bot], axis=-2)
    return (_logm_impl(blk)[..., :d, d:],)


logm.defvjp(_logm_fwd, _logm_bwd)


def meanm(mats, max_iter: int = 1024, tol: float = 1e-20):
    r"""Exponential barycenter of a set of invertible matrices
    ``(..., N, M, M) -> (..., M, M)`` (Pennec & Arsigny 2012), by
    fixed-point iteration: project through ``logm(mean \ A_n)``,
    average in the tangent space, ``expm`` back. All computations in
    float64 (reference contract, ``lie.py:65-73``).

    Leading batch dims run **natively** (extension; the reference is
    ``(N, M, M)`` only): G independent barycenters iterate in ONE
    ``while_loop`` whose per-problem state (plateau/divergence masks,
    best iterates) is lane-parallel, and every inner ``logm``/``expm``
    sees the full flattened ``G*N`` batch — which is what lets the
    Pallas register kernels run at their lane-packed rates. Prefer
    this over ``vmap(meanm)``: vmap must batch the *kernel call*
    per problem (a grid step per barycenter, each padded to a full
    lane block — measured ~65x slower at G=4096, K=8, 4x4).

    Reference analog: ``lie.py:13-91``. Like the reference, iteration
    proceeds on the real-cast ``logm`` even for barycenters that swing
    matrices across the branch cut (``lie.py:80-82`` — its complex
    check never fires because its ``logm`` already real-casts); a NaN
    from a genuinely singular projection still aborts with a warning.

    The reference iterates in float64 unconditionally (``lie.py:65-73``);
    under JAX that requires ``jax.config.update("jax_enable_x64", True)``.
    When x64 is disabled this falls back to float32 and warns once.

    Convergence/accuracy contract (divergence from the reference,
    documented): the loop exits at the first non-improving residual
    (plateau detection) in addition to ``tol``/``max_iter`` — the
    reference's ``tol=1e-20`` default sits *below* the f32 noise floor,
    so a float32 run would otherwise always pay ``max_iter``
    iterations and return a wandered iterate. Measured f32 floor
    (TPU, 4x4, K=8, spread 0.25): fixed-point residual
    ``||mean_k logm(mean \\ A_k)||_F`` relative to the mean tangent
    norm converges to ~1e-6 (median) in 4-6 iterations; float64
    reaches ~1e-13. The returned mean is the best-measured iterate.
    """
    from .batched import batchmatmul as _lie_bmm

    mats = jnp.asarray(mats)
    in_dtype = mats.dtype
    use_f64 = jax.config.read("jax_enable_x64")
    if not use_f64:
        warnings.warn(
            "meanm: jax_enable_x64 is off; iterating in float32 while "
            "the reference contract is float64 (enable x64 for parity)",
            RuntimeWarning,
        )
    work = jnp.float64 if use_f64 else jnp.float32
    mats = mats.astype(work)
    dim = mats.shape[-1]
    gshape = mats.shape[:-3]  # leading problem batch (may be empty)

    # Stall/plateau detection (divergence from the reference,
    # documented): the residual sequence of the Pennec fixed point
    # decreases monotonically (quadratically near the optimum) until it
    # bottoms out at the working-precision noise floor; past that it
    # wiggles — or, for batches containing rotations at/near the
    # injectivity radius (angle pi), grows ~2x per iteration until the
    # mean wanders off the manifold. Either way the first
    # non-improving iteration is the exit: track the best-measured
    # iterate and stop as soon as sos fails to beat it. The
    # reference's loop (``lie.py:76-91``) iterates to max_iter when
    # ``tol`` is unreachable (its 1e-20 default is *below* the f32
    # floor — round-5 fix: meanm ran all 64 bench iterations, 10x the
    # useful work) and would silently return the wandered mean.
    # All masks are per-problem: a stalled/diverged barycenter freezes
    # while its batch-mates keep iterating.
    def cond(carry):
        _, _, _, sos, n_iter, diverged, stalled = carry
        active = (sos > tol) & ~diverged & ~stalled
        return (n_iter < max_iter) & jnp.any(active)

    def body(carry):
        mean, best_mean, best_sos, sos_in, n_iter, diverged_in, \
            stalled_in = carry
        # regular-case log only (see _logm_plain): a branch-cut /
        # non-converged projection is meanm divergence by contract
        # (reference ``lie.py:80-82``), and the rescue's lax.cond
        # would run both branches every iteration inside while_loop
        log_mats, log_ok = _logm_plain(
            lmdiv(mean[..., None, :, :], mats), sym_route=False)
        bad = ~(jnp.all(jnp.isfinite(log_mats), axis=(-2, -1)) & log_ok)
        diverged = diverged_in | jnp.any(bad, axis=-1)
        mean_log = jnp.mean(log_mats, axis=-3)
        sos = jnp.sum(mean_log**2, axis=(-2, -1))
        # plateau test against the best BEFORE this iteration (the
        # incoming carry): comparing against the just-updated best
        # would always read equal and exit after one step
        frozen = diverged | stalled_in
        stalled = stalled_in | ((sos >= best_sos) & ~frozen)
        sos = jnp.where(frozen, sos_in, sos)
        better = (sos < best_sos) & ~frozen
        bm = better[..., None, None]
        best_mean = jnp.where(bm, mean, best_mean)
        best_sos = jnp.where(better, sos, best_sos)
        # batchmatmul, not `@`: on TPU a raw f32 dot_general defaults
        # to bf16 MXU passes — its ~1e-3 relative noise re-enters the
        # fixed point every iteration and floors the residual at
        # sos ~ 2.5e-5 (measured round 5; the unrolled tiny-matmul
        # tier is exact f32 VPU work and ~10x faster at 4x4 anyway)
        new_mean = jnp.where(frozen[..., None, None], mean,
                             _lie_bmm(mean, expm(mean_log)))
        return (new_mean, best_mean, best_sos, sos, n_iter + 1, diverged,
                stalled)

    eye = jnp.broadcast_to(jnp.eye(dim, dtype=work),
                           gshape + (dim, dim))
    inf = jnp.full(gshape, jnp.inf, work)
    false = jnp.zeros(gshape, bool)
    init = (eye, eye, inf, inf, jnp.asarray(0), false, false)
    mean, best_mean, best_sos, sos, _, diverged, _ = jax.lax.while_loop(
        cond, body, init
    )
    # the post-update mean is better than the best measured one iff the
    # loop exited while still improving (tol/max_iter exit)
    mean = jnp.where(((sos <= best_sos) & ~diverged)[..., None, None],
                     mean, best_mean)
    if not isinstance(diverged, jax.core.Tracer) and bool(
            jnp.any(diverged)):
        warnings.warn("`meanm` failed to converge (`logm` -> NaN)",
                      RuntimeWarning)
    return mean.astype(in_dtype)
