"""Matrix-free stochastic estimators: Hutchinson/Hutch++ trace, VBALD
log-determinant, power-iteration max-eigenvalue.

Capability parity with the reference's ``stochastic`` module
(``nitorch_fastmath/stochastic.py``: ``trapprox:9``, ``vbald:149``,
``maxeig_power:316``).

TPU-first design notes:

* Randomness is **explicit**: every estimator takes a JAX PRNG ``key``
  (default: ``jax.random.key(0)`` for reproducibility) instead of
  global RNG state.
* Sample loops become ``vmap`` over a probe axis (the reference loops
  Python-side per sample, ``stochastic.py:135-142``); all probes ride
  one batched matvec, which is exactly the huge-batch regime the rest
  of the library optimizes.
* ``maxeig_power`` is a ``lax.while_loop`` with tolerance-based early
  exit compiled on device (reference: host loop ``:356-361``).
* When ``matvec`` is a callable, it must be jax-traceable. When it is
  an array, the batched matmul path is used directly.

Cross-chip note (SURVEY.md §5): probe estimates are embarrassingly
parallel; under ``shard_map`` the probe axis shards across devices and
the final moment average is one ``psum`` — see
:mod:`fastmath_tpu.parallel`.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


__all__ = ["trapprox", "vbald", "maxeig_power"]


def _as_matvec(matvec, shape, dtype):
    """Normalize the (tensor | callable) matvec argument."""
    if isinstance(matvec, (jnp.ndarray, np.ndarray)) and not callable(matvec):
        mat = jnp.asarray(matvec)
        shape = (*mat.shape[:-2], mat.shape[-1])
        dtype = mat.dtype

        def mv(x):
            # precision="highest": TPU's default f32 matmul runs bf16
            # MXU passes (~1e-3 relative) — fine under MC sampling
            # error, but maxeig_power's Rayleigh quotient converges
            # deterministically and would inherit the bf16 floor
            return jnp.matmul(mat, x[..., None],
                              precision="highest")[..., 0]

        return mv, tuple(shape), dtype
    if shape is None:
        raise ValueError("shape= is required when matvec is a callable")
    return matvec, tuple(shape), dtype or jnp.result_type(float)


def _sample(key, method, shape, dtype):
    if method[0].lower() == "r":
        return jax.random.rademacher(key, shape, dtype=dtype)
    return jax.random.normal(key, shape, dtype=dtype)


def _flat_dot(a, b):
    return jnp.sum(a * b)


def trapprox(
    matvec: Union[jnp.ndarray, Callable],
    shape: Optional[Sequence[int]] = None,
    moments: Optional[int] = None,
    samples: int = 10,
    method: str = "rademacher",
    hutchpp: bool = False,
    key: Optional[jax.Array] = None,
    dtype=None,
):
    r"""Stochastic trace approximation ``tr(A^j), j = 1..moments``.

    Hutchinson (1989) by default; ``hutchpp=True`` uses the Hutch++
    low-rank-deflation variant (Meyer et al. 2021): QR of the probe
    image + residual correction (reference ``stochastic.py:96-133``).

    A batched tensor argument is treated as ONE block-diagonal
    operator (the reference's single-operator contract): the estimate
    is the **sum** of the per-matrix traces, a scalar. For per-matrix
    batched estimates, vmap over the batch axis.
    Returns scalar if ``moments is None`` else a ``(moments,)`` vector.
    """
    mv, shape, dtype = _as_matvec(matvec, shape, dtype)
    if key is None:
        key = jax.random.key(0)
    no_moments = moments is None
    nmom = moments or 1
    numel = int(np.prod(shape))

    mv_flat = lambda x: mv(x.reshape(shape)).reshape(-1)
    mv_batch = jax.vmap(mv_flat)

    if hutchpp:
        s = int(math.ceil(samples / 3))
        kq, kg = jax.random.split(key)
        q = _sample(kq, method, (s, numel), dtype)
        g = _sample(kg, method, (s, numel), dtype)
        # orthonormal basis of the probe image: deflate the top subspace
        qbasis, _ = jnp.linalg.qr(mv_batch(q).T)  # (numel, s)
        qbasis = qbasis.T  # (s, numel)
        g = g - jnp.matmul(
            jnp.matmul(g, qbasis.T, precision="highest"), qbasis,
            precision="highest")
        t = []
        mq, mg = qbasis, g
        for _ in range(nmom):
            mq = mv_batch(mq)
            mg = mv_batch(mg)
            t.append(jnp.sum(qbasis * mq) + jnp.sum(g * mg) / s)
        t = jnp.stack(t)
    else:
        probes = _sample(key, method, (samples, numel), dtype)

        def one_probe(v):
            m = v
            outs = []
            for _ in range(nmom):
                m = mv_flat(m)
                outs.append(jnp.dot(m, v))
            return jnp.stack(outs)

        t = jnp.mean(jax.vmap(one_probe)(probes), axis=0)
    return t[0] if no_moments else t


def maxeig_power(
    matvec: Union[jnp.ndarray, Callable],
    shape: Optional[Sequence[int]] = None,
    max_iter: int = 512,
    tol: float = 1e-6,
    key: Optional[jax.Array] = None,
    dtype=None,
):
    """Largest eigenvalue by power iteration with Rayleigh-quotient
    convergence, as an on-device ``while_loop`` (reference
    ``stochastic.py:316-361``).

    A batched tensor argument is ONE block-diagonal operator: the
    result is the scalar **global** max eigenvalue across the batch
    (measured 4e-6 relative at 64 x 64x64). For per-matrix dominant
    eigenvalues of compact-symmetric batches use
    :func:`fastmath_tpu.ops.sym.sym_maxeig` (the fused lane-parallel
    kernel); or vmap this function.
    """
    mv, shape, dtype = _as_matvec(matvec, shape, dtype)
    if key is None:
        key = jax.random.key(0)
    v0 = _sample(key, "rademacher", shape, dtype)

    def cond(carry):
        _, mu, mu0, it = carry
        return (jnp.abs(mu - mu0) >= tol) & (it < max_iter)

    def body(carry):
        v, mu, _, it = carry
        w = v
        v = mv(v)
        mu_new = _flat_dot(w, v)
        v = v / jnp.sqrt(_flat_dot(v, v))
        return v, mu_new, mu, it + 1

    init = (v0, jnp.asarray(jnp.inf, dtype), jnp.asarray(0.0, dtype),
            jnp.asarray(0))
    _, mu, _, _ = jax.lax.while_loop(cond, body, init)
    return mu


def _factexp(lam, coeff):
    """exp(-1 - sum_i coeff[i] lam^(i+1)) for a batch of lam."""
    powers = lam[..., None] ** jnp.arange(1, coeff.shape[0] + 1)
    return jnp.exp(-1.0 - jnp.matmul(powers, coeff,
                                     precision="highest"))


def _vbald_moments_mc(coeff, lam):
    """Monte-Carlo moments s_j = E[lam^j * factexp(lam)], j=0..2m."""
    nprm = 1 + 2 * coeff.shape[0]
    q = _factexp(lam, coeff)
    s = [jnp.mean(q)]
    p = q
    for _ in range(1, nprm):
        p = p * lam
        s.append(jnp.mean(p))
    return jnp.stack(s)


def vbald(
    matvec: Union[jnp.ndarray, Callable],
    shape: Optional[Sequence[int]] = None,
    upper: Optional[float] = None,
    moments: int = 5,
    samples: int = 5,
    mc_samples: int = 64,
    method: str = "rademacher",
    key: Optional[jax.Array] = None,
    dtype=None,
    max_iter: int = 512,
    tol: float = 1e-6,
):
    """Variational Bayesian Approximation of Log Determinants (Granziol
    et al. 2018): normalize by the max eigenvalue, estimate moments of
    the eigenvalue density, fit a Beta prior by ML, Gauss-Newton fit of
    the exponential-family coefficients (with Armijo backtracking), then
    Monte-Carlo ``E[log lam]``. Runs eagerly (host-controlled GN loop),
    like the reference (``stochastic.py:149-313``).

    A batched tensor argument is ONE block-diagonal operator: the
    result is the scalar **sum** of the per-matrix logdets (vmap for
    per-matrix estimates).
    """
    mv, shape, dtype = _as_matvec(matvec, shape, dtype)
    if key is None:
        key = jax.random.key(0)
    k_eig, k_mom, k_mc1, k_mc2 = jax.random.split(key, 4)
    numel = int(np.prod(shape))

    if not upper:
        upper = maxeig_power(mv, shape, key=k_eig, dtype=dtype)
    upper = jnp.asarray(upper, dtype)
    mv2 = lambda x: mv(x) / upper
    mom = trapprox(mv2, shape, moments=moments, samples=samples,
                   method=method, key=k_mom, dtype=dtype)
    mom = mom / numel

    # Beta prior by maximum likelihood on the first two moments
    # (reference :215-220)
    m1, m2 = float(mom[0]), float(mom[1])
    denom = m2 - m1 * m1
    alpha = m1 * (m1 - m2) / denom if denom != 0 else -1.0
    beta = alpha * (1.0 / m1 - 1.0) if m1 != 0 else -1.0
    if alpha > 0 and beta > 0:
        lam_mc = jax.random.beta(k_mc1, alpha, beta, (mc_samples,)).astype(dtype)
    else:
        lam_mc = jax.random.uniform(k_mc2, (mc_samples,), dtype,
                                    minval=1e-8, maxval=1.0)

    # Gauss-Newton fit of exp-family coefficients (reference _vbald_gn)
    coeff = jnp.zeros_like(mom)

    def mc_loss(c):
        return float(jnp.mean(_factexp(lam_mc, c)) + jnp.dot(c, mom))

    loss = mc_loss(coeff)
    for _ in range(max_iter):
        s = _vbald_moments_mc(coeff, lam_mc)
        grad = mom - s[1 : moments + 1]
        hess = s[2 : 2 * moments + 1 + 1]
        H = jnp.asarray(
            [[s[2 + i + j] for j in range(moments)] for i in range(moments)]
        )
        diag = jnp.diagonal(H)
        H = H + jnp.diag(1e-3 * jnp.max(jnp.abs(diag)) * jnp.ones_like(diag))
        delta = jnp.linalg.solve(H, grad)
        # Armijo backtracking (reference :244-256)
        success = False
        armijo = 1.0
        for _ in range(12):
            cand = coeff - armijo * delta
            cand_loss = mc_loss(cand)
            if cand_loss < loss:
                success = True
                break
            armijo /= 2
        if not success:
            break
        gain = abs(cand_loss - loss)
        coeff, loss = cand, cand_loss
        if gain < tol:
            break

    # logdet(A) = N * (E[log lam] + log(upper))
    # core.accmath.log, not jnp.log: the output IS a log and XLA TPU's
    # f32 log is ~4000 ulp worst-case (round-4 finding).
    from ..core.accmath import log as _acclog

    elog = jnp.mean(_acclog(lam_mc) * _factexp(lam_mc, coeff))
    return numel * (elog + _acclog(upper))
