"""Tests for the channel-first batched Pallas kernels (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.kernels.batched_pallas import (
    chol_cf,
    det_cf,
    inv_cf,
    matvec_full_cf,
)
from fastmath_tpu.layouts import full_to_sym


def rand_full_cf(rng, b, n, spd=False):
    a = rng.standard_normal((b, n, n))
    if spd:
        a = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n)
    else:
        a = a + np.eye(n) * n  # well-conditioned
    cf = np.ascontiguousarray(a.reshape(b, n * n).T)
    return a, cf


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 8])
def test_det(n, rng):
    full, cf = rand_full_cf(rng, 300, n)
    got = np.asarray(det_cf(jnp.asarray(cf), block=256))
    np.testing.assert_allclose(got, np.linalg.det(full), rtol=1e-10)


@pytest.mark.parametrize("n", [2, 3, 4, 5, 7, 8])
def test_inv(n, rng):
    full, cf = rand_full_cf(rng, 300, n)
    got = np.asarray(inv_cf(jnp.asarray(cf), block=256))
    want = np.linalg.inv(full).reshape(-1, n * n).T
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("n", [2, 3, 4, 6, 8])
def test_matvec_full(n, rng):
    full, cf = rand_full_cf(rng, 300, n)
    v = rng.standard_normal((300, n))
    got = np.asarray(
        matvec_full_cf(jnp.asarray(cf), jnp.asarray(v.T), block=256)
    ).T
    np.testing.assert_allclose(got, np.einsum("...ij,...j->...i", full, v),
                               rtol=1e-12)


@pytest.mark.parametrize("n", [2, 4, 6, 8])
def test_chol(n, rng):
    full, _ = rand_full_cf(rng, 200, n, spd=True)
    compact = np.asarray(full_to_sym(jnp.asarray(full))).T
    got = np.asarray(chol_cf(jnp.asarray(compact), block=128)).T
    want_l = np.linalg.cholesky(full)
    want = np.asarray(full_to_sym(jnp.asarray(
        want_l + np.swapaxes(want_l, -1, -2)
        - want_l * np.eye(n))))  # compact slots hold L's lower triangle
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_pad_identity_lanes(rng):
    # batch not a multiple of 128: padded lanes must stay finite
    full, cf = rand_full_cf(rng, 37, 3)
    got = np.asarray(inv_cf(jnp.asarray(cf), block=128))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(
        got, np.linalg.inv(full).reshape(-1, 9).T, rtol=1e-9, atol=1e-12
    )


def test_det_grad(rng):
    full, cf = rand_full_cf(rng, 130, 3)
    cfj = jnp.asarray(cf)
    g = jax.grad(lambda m: jnp.sum(det_cf(m, block=128)))(cfj)
    gw = jax.grad(
        lambda m: jnp.sum(jnp.linalg.det(m.T.reshape(-1, 3, 3)))
    )(cfj)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw),
                               rtol=1e-8, atol=1e-10)


def test_inv_grad(rng):
    full, cf = rand_full_cf(rng, 130, 3)
    cfj = jnp.asarray(cf)
    co = jnp.asarray(rng.standard_normal(cf.shape))
    g = jax.grad(lambda m: jnp.sum(co * inv_cf(m, block=128)))(cfj)
    gw = jax.grad(
        lambda m: jnp.sum(
            co
            * jnp.linalg.inv(m.T.reshape(-1, 3, 3)).reshape(-1, 9).T
        )
    )(cfj)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw),
                               rtol=1e-8, atol=1e-10)


def test_chol_grad(rng):
    full, _ = rand_full_cf(rng, 130, 3, spd=True)
    compact = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(full))).T)
    co = jnp.asarray(rng.standard_normal(compact.shape))

    from fastmath_tpu.layouts import sym_to_full

    def ours(m):
        return jnp.sum(co * chol_cf(m, block=128))

    def ref_from_compact(m):
        fl = sym_to_full(m.T)
        l = jnp.linalg.cholesky(fl)
        comp = full_to_sym(l + jnp.swapaxes(l, -1, -2)
                           - l * jnp.eye(3, dtype=l.dtype))
        return jnp.sum(co * comp.T)

    g = jax.grad(ours)(compact)
    gw = jax.grad(ref_from_compact)(compact)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw),
                               rtol=1e-7, atol=1e-9)


def test_det_grad_plu(rng):
    """det_cf VJP on the n>4 PLU path (det * inv^T cofactors)."""
    full, cf = rand_full_cf(rng, 4, 6)
    cfj = jnp.asarray(cf)
    co = jnp.asarray(rng.standard_normal(4))

    def loss(m):
        return jnp.sum(co * det_cf(m, block=256))

    g = jax.grad(loss)(cfj)
    h = 1e-6
    for idx in [(0, 1), (17, 2), (35, 3)]:
        e = jnp.zeros_like(cfj).at[idx].set(h)
        fd = (loss(cfj + e) - loss(cfj - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd),
                                   rtol=1e-4, atol=1e-6)


# --- rolled stacked-grid PLU tier (9 <= n <= 16, BASELINE 16x16 gate) ------


@pytest.mark.parametrize("n", [9, 12, 16])
def test_rolled_tier_solve_inv_det_logdet(n, rng):
    from fastmath_tpu.kernels.batched_pallas import logdet_cf, solve_full_cf

    b = 260
    a = rng.standard_normal((b, n, n))
    spd = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n)
    cf = jnp.asarray(np.ascontiguousarray(spd.reshape(b, n * n).T))
    got_inv = np.asarray(inv_cf(cf, block=128)).T.reshape(b, n, n)
    np.testing.assert_allclose(got_inv, np.linalg.inv(spd), atol=1e-9)
    det = np.linalg.det(spd)
    np.testing.assert_allclose(np.asarray(det_cf(cf, block=128)), det,
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(logdet_cf(cf, block=128)),
                               np.linalg.slogdet(spd)[1], rtol=1e-9,
                               atol=1e-12)
    k = 3
    rhs = rng.standard_normal((b, n, k))
    rcf = jnp.asarray(np.ascontiguousarray(rhs.reshape(b, n * k).T))
    got_s = np.asarray(solve_full_cf(cf, rcf, k=k, block=128))
    np.testing.assert_allclose(got_s.T.reshape(b, n, k),
                               np.linalg.solve(spd, rhs), atol=1e-8)


def test_rolled_tier_pivoting_general(rng):
    """Non-SPD inputs exercise the one-hot row swaps for real."""
    n, b = 12, 260
    a = rng.standard_normal((b, n, n))  # unregularized: pivoting matters
    cf = jnp.asarray(np.ascontiguousarray(a.reshape(b, n * n).T))
    want = np.linalg.inv(a)
    got = np.asarray(inv_cf(cf, block=128)).T.reshape(b, n, n)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-6


def test_rolled_tier_grads(rng):
    from fastmath_tpu.kernels.batched_pallas import logdet_cf, solve_full_cf

    n, b, h = 10, 64, 1e-6
    a = rng.standard_normal((b, n, n))
    spd = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n)
    cf = jnp.asarray(np.ascontiguousarray(spd.reshape(b, n * n).T))
    probes = [(5, 3), (n * n - 1, 7)]

    def fd_check(loss, g, x, extra=None):
        for idx in probes:
            e = jnp.zeros_like(x).at[idx].set(h)
            args = ((x + e,) if extra is None else (x + e, extra))
            args2 = ((x - e,) if extra is None else (x - e, extra))
            fd = (loss(*args) - loss(*args2)) / (2 * h)
            np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd),
                                       rtol=1e-4, atol=1e-6)

    linv = lambda m: jnp.sum(jnp.sin(inv_cf(m, block=128)))
    fd_check(linv, jax.grad(linv)(cf), cf)
    lld = lambda m: jnp.sum(jnp.sin(logdet_cf(m, block=128)))
    fd_check(lld, jax.grad(lld)(cf), cf)
    k = 2
    rhs = jnp.asarray(np.ascontiguousarray(
        rng.standard_normal((b, n, k)).reshape(b, n * k).T))
    ls = lambda m, r: jnp.sum(jnp.sin(solve_full_cf(m, r, k=k, block=128)))
    fd_check(lambda m, r: ls(m, r), jax.grad(ls, argnums=0)(cf, rhs), cf,
             extra=rhs)


def test_rolled_tier_public_routing(rng):
    """Public ops at 16x16 agree across backends (incl. vector lmdiv)."""
    from fastmath_tpu.ops import batched as B_
    from fastmath_tpu.ops.sym import sym_det, sym_invert, sym_solve
    from fastmath_tpu.layouts.sym import sym_to_full

    n, b = 16, 200
    a = rng.standard_normal((b, n, n))
    spd = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n)
    aj = jnp.asarray(spd)
    v = jnp.asarray(rng.standard_normal((b, n)))
    for backend in ("pallas", "xla"):
        np.testing.assert_allclose(
            np.asarray(B_.batchinv(aj, backend=backend)),
            np.linalg.inv(spd), atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(B_.batchlogdet(aj, backend=backend)),
            np.linalg.slogdet(spd)[1], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(B_.batchlmdiv(aj, v, backend=backend)),
            np.linalg.solve(spd, np.asarray(v)[..., None])[..., 0],
            atol=1e-8)
    c = jnp.asarray(np.asarray(full_to_sym(aj)))
    for backend in ("pallas", "xla"):
        np.testing.assert_allclose(
            np.asarray(sym_solve(c, v, backend=backend)),
            np.linalg.solve(spd, np.asarray(v)[..., None])[..., 0],
            atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(sym_to_full(jnp.asarray(
                sym_invert(c, backend=backend)))),
            np.linalg.inv(spd), atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(sym_det(c, backend=backend)), np.linalg.det(spd),
            rtol=1e-8)


@pytest.mark.parametrize("mkn", [(4, 4, 4), (8, 5, 3), (16, 16, 16),
                                 (12, 7, 20), (32, 32, 32)])
def test_matmul_cf(mkn, rng):
    from fastmath_tpu.kernels.batched_pallas import matmul_cf

    m, k, n = mkn
    b = 300
    A = rng.standard_normal((b, m, k))
    B = rng.standard_normal((b, k, n))
    acf = jnp.moveaxis(jnp.asarray(A.reshape(b, m * k)), -1, 0)
    bcf = jnp.moveaxis(jnp.asarray(B.reshape(b, k * n)), -1, 0)
    got = np.moveaxis(np.asarray(matmul_cf(acf, bcf, m, n, block=256)),
                      0, -1).reshape(b, m, n)
    np.testing.assert_allclose(got, A @ B, rtol=1e-12, atol=1e-12)


def test_matmul_cf_grad(rng):
    from fastmath_tpu.kernels.batched_pallas import matmul_cf

    m, k, n, b = 6, 9, 5, 64
    A = rng.standard_normal((b, m, k))
    B = rng.standard_normal((b, k, n))
    acf = jnp.moveaxis(jnp.asarray(A.reshape(b, m * k)), -1, 0)
    bcf = jnp.moveaxis(jnp.asarray(B.reshape(b, k * n)), -1, 0)

    def f(a, bb):
        return jnp.sum(jnp.sin(matmul_cf(a, bb, m, n, block=128)))

    def f_ref(a, bb):
        am = jnp.moveaxis(a, 0, -1).reshape(b, m, k)
        bm = jnp.moveaxis(bb, 0, -1).reshape(b, k, n)
        return jnp.sum(jnp.sin(am @ bm))

    g1, g2 = jax.grad(f, argnums=(0, 1))(acf, bcf)
    h1, h2 = jax.grad(f_ref, argnums=(0, 1))(acf, bcf)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(h1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(h2), atol=1e-12)


def test_batchmatmul_public_routing(rng):
    """batchmatmul agrees across backends (incl. rectangular +
    broadcast batches); forced pallas raises out of domain."""
    from fastmath_tpu.ops.batched import batchmatmul

    A = rng.standard_normal((128, 16, 12)).astype(np.float32)
    B = rng.standard_normal((128, 12, 20)).astype(np.float32)
    want = A @ B
    for backend in ("pallas", "xla", "auto"):
        got = np.asarray(batchmatmul(jnp.asarray(A), jnp.asarray(B),
                                     backend=backend))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # broadcast leading dims
    A2 = rng.standard_normal((1, 7, 7)).astype(np.float32)
    B2 = rng.standard_normal((64, 7, 7)).astype(np.float32)
    got2 = np.asarray(batchmatmul(jnp.asarray(A2), jnp.asarray(B2),
                                  backend="pallas"))
    np.testing.assert_allclose(got2, A2 @ B2, rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError):
        batchmatmul(jnp.zeros((8, 33, 33), np.float32),
                    jnp.zeros((8, 33, 33), np.float32), backend="pallas")
