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
