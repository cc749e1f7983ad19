"""Closed-form analytic eig_sym tier (real symmetric, n <= 3).

The analytic path is the `backend="auto"` default at n <= 3 (values
and eigenvectors) on every platform — pure elementwise XLA, no
iteration (`ops/qr.py:_eig3_analytic_w`). Oracles are float64
`np.linalg.eigvalsh`. Reference analog: the reference iterates
shifted-QR even at n = 2 (`_impl/qr.py:533-657`); closed forms are the
TPU build's design (the reference's closed-form *solve* tier,
`_impl/sym.py:194-252`, is the precedent).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fastmath_tpu.ops.qr as Q


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _sym(rng, b, n, dtype=np.float64):
    a = rng.standard_normal((b, n, n)).astype(dtype)
    return (a + np.swapaxes(a, -1, -2)) / 2


@pytest.mark.parametrize("n", [1, 2, 3])
def test_analytic_values_random(n, rng):
    a = _sym(rng, 64, n)
    w = np.asarray(Q.eig_sym(jnp.asarray(a), backend="analytic"))
    want = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.sort(w, -1), np.sort(want, -1),
                               rtol=1e-12, atol=1e-12)


def test_auto_routes_to_analytic_everywhere(rng):
    # at n <= 3 the auto default is the analytic path on every
    # platform: descending order at 3x3 is its signature (the Jacobi
    # paths return diagonal order, which is generically unsorted)
    a = _sym(rng, 32, 3)
    w = np.asarray(Q.eig_sym(jnp.asarray(a)))
    assert np.all(np.diff(w, axis=-1) <= 1e-12)
    np.testing.assert_allclose(
        np.sort(w, -1), np.sort(np.linalg.eigvalsh(a), -1),
        rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n", [2, 3])
def test_analytic_degenerate_and_diagonal(n, rng):
    batch = [np.eye(n), np.zeros((n, n)), -3.5 * np.eye(n),
             np.diag(np.arange(1.0, n + 1.0)),
             np.diag([2.0] * (n - 1) + [5.0])]
    a = np.stack(batch)
    w = np.asarray(Q.eig_sym(jnp.asarray(a), backend="analytic"))
    want = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.sort(w, -1), np.sort(want, -1),
                               rtol=1e-13, atol=1e-13)


def test_analytic_near_degenerate(rng):
    # eigenvalue gaps down to exact degeneracy: the deflation refine
    # (ops/qr.py:_eig3_analytic_w) restores ~10 eps * ||A|| absolute
    # accuracy where raw roots-from-coefficients degrade to ~sqrt(eps)
    qmat, _ = np.linalg.qr(rng.standard_normal((16, 3, 3)))
    for gap in (1e-6, 1e-10, 1e-14, 0.0):
        lam = np.stack([np.ones(16), 1 + gap * np.ones(16),
                        2 * np.ones(16)], -1)
        a = np.einsum("...ij,...j,...kj->...ik", qmat, lam, qmat)
        w = np.sort(np.asarray(Q.eig_sym(jnp.asarray(a),
                                         backend="analytic")), -1)
        np.testing.assert_allclose(w, np.sort(np.linalg.eigvalsh(a), -1),
                                   atol=1e-13, rtol=0)


@pytest.mark.parametrize("scale", [1e30, 1e-30, 1e37])
def test_analytic_extreme_scale_f32(scale, rng):
    # squared invariants overflow f32 at ||A|| ~ 1e19 without the
    # per-matrix prescale; the closed form must stay finite and
    # relatively accurate at any scale
    a64 = _sym(rng, 32, 3) * scale
    a = jnp.asarray(a64.astype(np.float32))
    w = np.asarray(Q.eig_sym(a, backend="analytic"))
    assert np.all(np.isfinite(w))
    want = np.linalg.eigvalsh(np.asarray(a, np.float64))
    np.testing.assert_allclose(np.sort(w, -1), np.sort(want, -1),
                               rtol=1e-5, atol=scale * 1e-6)


def test_analytic_vectors_2x2(rng):
    a = _sym(rng, 64, 2)
    w, u = Q.eig_sym(jnp.asarray(a), compute_u=True, backend="analytic")
    w, u = np.asarray(w), np.asarray(u)
    recon = np.einsum("...ij,...j,...kj->...ik", u, w, u)
    np.testing.assert_allclose(recon, a, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.einsum("...ji,...jk->...ik", u, u),
        np.broadcast_to(np.eye(2), u.shape), atol=1e-13)
    # degenerate: still exactly orthonormal
    w, u = Q.eig_sym(jnp.asarray(np.zeros((3, 2, 2))), compute_u=True,
                     backend="analytic")
    np.testing.assert_allclose(np.asarray(u),
                               np.broadcast_to(np.eye(2), (3, 2, 2)))


def test_analytic_vectors_1x1(rng):
    a = jnp.asarray(rng.standard_normal((5, 1, 1)))
    w, u = Q.eig_sym(a, compute_u=True)
    np.testing.assert_allclose(np.asarray(w), np.asarray(a)[..., 0, :])
    np.testing.assert_allclose(np.asarray(u), np.ones((5, 1, 1)))


def test_analytic_grad_sum_is_identity(rng):
    # d(sum_i w_i)/dA = I exactly (trace invariance) — exercises the
    # rank-matched Giles pullback at n = 3 and the rotation one at n = 2
    for n in (2, 3):
        a = jnp.asarray(_sym(rng, 4, n))
        g = jax.grad(lambda m: jnp.sum(Q.eig_sym(m, backend="analytic")))(a)
        np.testing.assert_allclose(np.asarray(g),
                                   np.broadcast_to(np.eye(n), a.shape),
                                   atol=1e-10)


@pytest.mark.parametrize("n", [2, 3])
def test_analytic_grad_matches_xla(n, rng):
    # order/sign-invariant scalar: gradients must agree across backends
    a = jnp.asarray(_sym(rng, 8, n))

    def loss(m, backend):
        w = Q.eig_sym(m, backend=backend)
        return jnp.sum(w ** 3)

    g_an = jax.grad(loss)(a, "analytic")
    g_xla = jax.grad(loss)(a, "xla")
    np.testing.assert_allclose(np.asarray(g_an), np.asarray(g_xla),
                               rtol=1e-8, atol=1e-10)


def test_analytic_vector_grad_matches_xla(rng):
    a = jnp.asarray(_sym(rng, 6, 2))
    tgt = jnp.asarray(_sym(rng, 6, 2))

    def loss(m, backend):
        w, u = Q.eig_sym(m, compute_u=True, backend=backend)
        recon = jnp.einsum("...ij,...j,...kj->...ik", u, w ** 2, u)
        return jnp.sum((recon - tgt) ** 2)

    g_an = jax.grad(loss)(a, "analytic")
    g_xla = jax.grad(loss)(a, "xla")
    np.testing.assert_allclose(np.asarray(g_an), np.asarray(g_xla),
                               rtol=1e-7, atol=1e-9)


def test_analytic_upper_lower_and_batchdims(rng):
    a = _sym(rng, 6, 3)
    junk = a.copy()
    junk[..., np.tril_indices(3, -1)[0], np.tril_indices(3, -1)[1]] = 99.0
    w = np.asarray(Q.eig_sym(jnp.asarray(junk), upper=True))
    np.testing.assert_allclose(np.sort(w, -1),
                               np.sort(np.linalg.eigvalsh(a), -1),
                               rtol=1e-12, atol=1e-12)
    # arbitrary leading batch dims
    a2 = _sym(rng, 24, 2).reshape(2, 3, 4, 2, 2)
    w2 = np.asarray(Q.eig_sym(jnp.asarray(a2)))
    assert w2.shape == (2, 3, 4, 2)


def test_analytic_bf16_contract(rng):
    a = _sym(rng, 16, 3).astype(np.float32)
    w = Q.eig_sym(jnp.asarray(a, jnp.bfloat16), backend="analytic")
    assert w.dtype == jnp.bfloat16
    want = np.linalg.eigvalsh(np.asarray(
        jnp.asarray(a, jnp.bfloat16), np.float64))
    np.testing.assert_allclose(np.sort(np.asarray(w, np.float64), -1),
                               np.sort(want, -1), rtol=0.05, atol=0.05)


def test_analytic_backend_validation(rng):
    with pytest.raises(ValueError):
        Q.eig_sym(jnp.asarray(_sym(rng, 2, 4)), backend="analytic")
    h = _sym(rng, 2, 3) + 1j * np.zeros((2, 3, 3))
    with pytest.raises(ValueError):
        Q.eig_sym(jnp.asarray(h), backend="analytic")


def test_analytic_vectors_3x3(rng):
    a = _sym(rng, 64, 3)
    w, u = Q.eig_sym(jnp.asarray(a), compute_u=True, backend="analytic")
    w, u = np.asarray(w), np.asarray(u)
    recon = np.einsum("...ij,...j,...kj->...ik", u, w, u)
    np.testing.assert_allclose(recon, a, rtol=1e-12, atol=1e-12)
    # exactly orthogonal by construction (orthonormal triple + rotation)
    np.testing.assert_allclose(
        np.einsum("...ji,...jk->...ik", u, u),
        np.broadcast_to(np.eye(3), u.shape), atol=1e-14)
    # w descending and paired with columns
    assert np.all(np.diff(w, axis=-1) <= 1e-12)


def test_analytic_vectors_3x3_degenerate(rng):
    # clustered / diagonal / isotropic inputs: reconstruction and exact
    # orthonormality must survive (the DTI isotropic-voxel case)
    qmat, _ = np.linalg.qr(rng.standard_normal((8, 3, 3)))
    cases = [np.einsum("...ij,...j,...kj->...ik", qmat,
                       np.stack([np.ones(8), (1 + 1e-9) * np.ones(8),
                                 2 * np.ones(8)], -1), qmat),
             np.broadcast_to(np.eye(3) * 2.5, (4, 3, 3)),
             np.zeros((2, 3, 3)),
             np.stack([np.diag([5.0, 2.0, 1.0]),
                       np.diag([2.0, 2.0, 7.0])])]
    for a in cases:
        w, u = Q.eig_sym(jnp.asarray(a), compute_u=True,
                         backend="analytic")
        w, u = np.asarray(w), np.asarray(u)
        recon = np.einsum("...ij,...j,...kj->...ik", u, w, u)
        np.testing.assert_allclose(recon, a, atol=1e-12)
        np.testing.assert_allclose(
            np.einsum("...ji,...jk->...ik", u, u),
            np.broadcast_to(np.eye(3), u.shape), atol=1e-14)


def test_analytic_vector_grad_matches_xla_3x3(rng):
    a = jnp.asarray(_sym(rng, 6, 3))
    tgt = jnp.asarray(_sym(rng, 6, 3))

    def loss(m, backend):
        w, u = Q.eig_sym(m, compute_u=True, backend=backend)
        recon = jnp.einsum("...ij,...j,...kj->...ik", u, w ** 2, u)
        return jnp.sum((recon - tgt) ** 2)

    g_an = jax.grad(loss)(a, "analytic")
    g_xla = jax.grad(loss)(a, "xla")
    np.testing.assert_allclose(np.asarray(g_an), np.asarray(g_xla),
                               rtol=1e-7, atol=1e-9)
