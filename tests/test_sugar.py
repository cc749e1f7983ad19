"""Parity tests for batched linalg sugar vs numpy/scipy oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastmath_tpu.ops import sugar as S


def test_kron2(rng):
    a = rng.standard_normal((2, 3, 4))
    b = rng.standard_normal((2, 2, 5))
    got = np.asarray(S.kron2(jnp.asarray(a), jnp.asarray(b)))
    want = np.stack([np.kron(a[i], b[i]) for i in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("method", ["lu", "chol", "svd", "pinv"])
def test_lmdiv(method, rng):
    a = rng.standard_normal((4, 5, 5))
    a = a @ np.swapaxes(a, -1, -2) + 5 * np.eye(5)  # SPD so chol works
    b = rng.standard_normal((4, 5, 3))
    got = np.asarray(S.lmdiv(jnp.asarray(a), jnp.asarray(b), method=method))
    want = np.linalg.solve(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


def test_lmdiv_nonsquare_pinv(rng):
    a = rng.standard_normal((6, 4))  # tall -> least squares
    b = rng.standard_normal((6, 2))
    got = np.asarray(S.lmdiv(jnp.asarray(a), jnp.asarray(b), method="lu"))
    want = np.linalg.pinv(a) @ b
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("method", ["lu", "chol", "svd", "pinv"])
def test_rmdiv(method, rng):
    a = rng.standard_normal((4, 3, 5))
    b = rng.standard_normal((4, 5, 5))
    b = b @ np.swapaxes(b, -1, -2) + 5 * np.eye(5)
    got = np.asarray(S.rmdiv(jnp.asarray(a), jnp.asarray(b), method=method))
    want = a @ np.linalg.inv(b)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("method", ["lu", "chol", "svd", "pinv"])
def test_inv(method, rng):
    a = rng.standard_normal((4, 5, 5))
    a = a @ np.swapaxes(a, -1, -2) + 5 * np.eye(5)
    got = np.asarray(S.inv(jnp.asarray(a), method=method))
    np.testing.assert_allclose(got, np.linalg.inv(a), rtol=1e-7, atol=1e-9)


def test_matvec_solvevec(rng):
    a = rng.standard_normal((7, 4, 4)) + 4 * np.eye(4)
    v = rng.standard_normal((7, 4))
    got = np.asarray(S.matvec(jnp.asarray(a), jnp.asarray(v)))
    np.testing.assert_allclose(got, np.einsum("...ij,...j->...i", a, v), rtol=1e-12)
    got = np.asarray(S.solvevec(jnp.asarray(a), jnp.asarray(v)))
    want = np.linalg.solve(a, v[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_outer_dot_complex(rng):
    a = rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))
    b = rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))
    # dot is antilinear in the FIRST argument: a^H b
    got = np.asarray(S.dot(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum(np.conj(a) * b, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # outer conjugates the SECOND argument: a b^H
    got = np.asarray(S.outer(jnp.asarray(a), jnp.asarray(b)))
    want = a[..., :, None] * np.conj(b)[..., None, :]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # keepdim
    assert S.dot(jnp.asarray(a), jnp.asarray(b), keepdim=True).shape == (3, 1)


def test_trace_mdot(rng):
    a = rng.standard_normal((5, 3, 3))
    b = rng.standard_normal((5, 3, 3))
    np.testing.assert_allclose(
        np.asarray(S.trace(jnp.asarray(a))), np.trace(a, axis1=-2, axis2=-1))
    assert S.trace(jnp.asarray(a), keepdim=True).shape == (5, 1, 1)
    got = np.asarray(S.mdot(jnp.asarray(a), jnp.asarray(b)))
    want = np.trace(np.swapaxes(a, -1, -2) @ b, axis1=-2, axis2=-1)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert S.mdot(jnp.asarray(a), jnp.asarray(b), keepdim=True).shape == (5, 1, 1)


def test_is_orthonormal():
    eye_basis = jnp.eye(4).reshape(4, 2, 2)  # 4 orthonormal 2x2 "matrices"
    assert S.is_orthonormal(eye_basis)
    check, mat = S.is_orthonormal(2 * eye_basis, return_matrix=True)
    assert not check
    np.testing.assert_allclose(np.asarray(mat), 4 * np.eye(4))


def test_round():
    x = jnp.asarray([1.2345, -0.6789])
    np.testing.assert_allclose(np.asarray(S.round(x, 2)), [1.23, -0.68])
    np.testing.assert_allclose(np.asarray(S.round(x)), [1.0, -1.0])


def test_lmdiv_chol_n16(rng):
    """chol method at the 16x16 unroll gate vs numpy."""
    n = 16
    a = rng.standard_normal((30, n, n))
    spd = a @ np.swapaxes(a, -1, -2) + n * np.eye(n)
    b = rng.standard_normal((30, n, 2))
    got = np.asarray(S.lmdiv(jnp.asarray(spd), jnp.asarray(b), method="chol"))
    np.testing.assert_allclose(got, np.linalg.solve(spd, b), rtol=1e-7,
                               atol=1e-9)
