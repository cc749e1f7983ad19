"""Tests for the lane-packed Pallas Jacobi eigensolver (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastmath_tpu.kernels.eig_pallas import eig_sym_cf
from fastmath_tpu.layouts import full_to_sym


def randsym_cf(rng, b, n):
    a = rng.standard_normal((b, n, n))
    a = a + np.swapaxes(a, -1, -2)
    compact = np.asarray(full_to_sym(jnp.asarray(a)))
    return a, np.ascontiguousarray(compact.T)


@pytest.mark.parametrize("n", [2, 3, 4, 6, 8, 9, 12, 16])
def test_eig_values(n, rng):
    # n <= 8: unrolled register cyclic Jacobi; n >= 9: rolled
    # parallel-order Jacobi on stacked grids — same entry point.
    full, cf = randsym_cf(rng, 300 if n <= 8 else 24, n)
    w = np.asarray(
        eig_sym_cf(jnp.asarray(cf), block=256, sweeps=10 if n <= 8 else 14)).T
    want = np.sort(np.linalg.eigvalsh(full), -1)
    np.testing.assert_allclose(np.sort(w, -1), want, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("n", [2, 4, 12])
def test_eig_vectors(n, rng):
    full, cf = randsym_cf(rng, 100 if n <= 8 else 16, n)
    w, u = eig_sym_cf(jnp.asarray(cf), compute_u=True, block=256,
                      sweeps=10 if n <= 8 else 14)
    w = np.asarray(w).T  # (B, n)
    u = np.asarray(u).T.reshape(-1, n, n)  # (B, n, n), u[b, i, j]
    recon = np.einsum("...ij,...j,...kj->...ik", u, w, u)
    np.testing.assert_allclose(recon, full, rtol=1e-8, atol=1e-8)
    gram = np.einsum("...ji,...jk->...ik", u, u)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(n), gram.shape),
                               atol=1e-9)


def test_matches_xla_eig(rng):
    from fastmath_tpu.ops.qr import eig_sym

    full, cf = randsym_cf(rng, 50, 4)
    w_pallas = np.sort(np.asarray(eig_sym_cf(jnp.asarray(cf), block=128)).T, -1)
    w_xla = np.sort(np.asarray(eig_sym(jnp.asarray(full))), -1)
    np.testing.assert_allclose(w_pallas, w_xla, rtol=1e-9, atol=1e-10)


class TestPublicDispatch:
    """eig_sym(backend=...) routes to the Pallas kernel with the Giles
    VJP preserved."""

    def test_values_match_xla(self, rng):
        from fastmath_tpu.ops.qr import eig_sym

        full, _ = randsym_cf(rng, 60, 4)
        a = jnp.asarray(full)
        w_p = np.sort(np.asarray(eig_sym(a, backend="pallas")), -1)
        w_x = np.sort(np.asarray(eig_sym(a, backend="xla")), -1)
        np.testing.assert_allclose(w_p, w_x, rtol=1e-9, atol=1e-10)

    def test_vectors_reconstruct(self, rng):
        from fastmath_tpu.ops.qr import eig_sym

        full, _ = randsym_cf(rng, 40, 3)
        a = jnp.asarray(full)
        w, u = eig_sym(a, compute_u=True, backend="pallas")
        recon = np.einsum("...ij,...j,...kj->...ik", np.asarray(u),
                          np.asarray(w), np.asarray(u))
        np.testing.assert_allclose(recon, full, rtol=1e-8, atol=1e-8)

    def test_rolled_tier_values_and_grad(self, rng):
        """9 <= n <= 16 routes to the rolled parallel-order Jacobi.

        Oracles are numpy (values: eigvalsh; grad of sum(c_i w_i):
        U diag(c) U^T, basis-stable for distinct eigenvalues) — the
        unrolled XLA Jacobi at n = 12 costs ~2 min of compile and
        adds nothing here."""
        import jax
        from fastmath_tpu.ops.qr import eig_sym

        full, _ = randsym_cf(rng, 12, 12)
        a = jnp.asarray(full)
        w_p = np.sort(np.asarray(eig_sym(a, backend="pallas")), -1)
        np.testing.assert_allclose(
            w_p, np.sort(np.linalg.eigvalsh(full), -1), rtol=1e-8, atol=1e-9)
        c = jnp.arange(1.0, 13.0)
        gp = jax.grad(
            lambda x: jnp.sum(c * jnp.sort(eig_sym(x, backend="pallas"), -1))
        )(a)
        wo, uo = np.linalg.eigh(full)  # ascending, matches the sort
        g_sym = np.einsum("...ik,k,...jk->...ij", uo, np.asarray(c), uo)
        # eig_sym reads the upper triangle only (upper=True): a_ij
        # (i < j) feeds both sym_ij and sym_ji, the lower triangle none
        iu = np.triu(np.ones((12, 12)), 1)
        g_ref = g_sym * (np.eye(12) + 2 * iu)
        np.testing.assert_allclose(np.asarray(gp), g_ref,
                                   rtol=1e-7, atol=1e-7)

    def test_grad_w_matches_xla(self, rng):
        import jax
        from fastmath_tpu.ops.qr import eig_sym

        full, _ = randsym_cf(rng, 20, 3)
        a = jnp.asarray(full)

        def loss(a, backend):
            return jnp.sum(eig_sym(a, backend=backend) ** 2)

        gp = jax.grad(lambda x: loss(x, "pallas"))(a)
        gx = jax.grad(lambda x: loss(x, "xla"))(a)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-7, atol=1e-9)

    def test_grad_wu_matches_xla(self, rng):
        import jax
        from fastmath_tpu.ops.qr import eig_sym

        full, _ = randsym_cf(rng, 12, 3)
        a = jnp.asarray(full)
        co_w = jnp.asarray(rng.standard_normal((12, 3)))
        co_u = jnp.asarray(rng.standard_normal((12, 3, 3)))

        def loss(a, backend):
            w, u = eig_sym(a, compute_u=True, backend=backend)
            return jnp.sum(co_w * w) + jnp.sum(co_u * u)

        gp = jax.grad(lambda x: loss(x, "pallas"))(a)
        gx = jax.grad(lambda x: loss(x, "xla"))(a)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-6, atol=1e-8)

    def test_backend_validation(self, rng):
        from fastmath_tpu.ops.qr import eig_sym, _EIG_PALLAS_MAX_N

        a = jnp.asarray(np.eye(3))
        with pytest.raises(ValueError):
            eig_sym(a, backend="nope")
        # probe the *current* out-of-domain boundary (read the cap, don't
        # hard-code it: round-3 shipped red because this test pinned 17
        # after the tier grew to 32)
        too_big = jnp.asarray(np.eye(_EIG_PALLAS_MAX_N + 1))
        with pytest.raises(ValueError):
            eig_sym(too_big, backend="pallas")
        # complex input is out of domain at any size
        with pytest.raises(ValueError):
            eig_sym(a.astype(jnp.complex64), backend="pallas")

    def test_cap_matches_kernel_tier(self):
        """The routing cap and the kernel's own cap must stay in sync —
        when the kernel tier grows, the public raise-boundary follows."""
        from fastmath_tpu.ops.qr import _EIG_PALLAS_MAX_N
        from fastmath_tpu.kernels.eig_pallas import _MAX_N

        assert _EIG_PALLAS_MAX_N == _MAX_N


def test_clustered_eigenvalues(rng):
    """Nearly-degenerate spectra stress the adaptive sweep exit: the
    off-norm threshold must not stop before the cluster resolves."""
    n, b = 4, 120
    w = np.stack([np.array([1.0, 1.0 + 1e-9, 2.0, 3.0])] * b)
    q, _ = np.linalg.qr(rng.standard_normal((b, n, n)))
    full = np.einsum("...ij,...j,...kj->...ik", q, w, q)
    full = 0.5 * (full + np.swapaxes(full, -1, -2))
    compact = np.ascontiguousarray(
        np.asarray(full_to_sym(jnp.asarray(full))).T)
    got = np.sort(np.asarray(eig_sym_cf(jnp.asarray(compact), block=128)).T, -1)
    want = np.sort(np.linalg.eigvalsh(full), -1)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_near_diagonal_fast_exit(rng):
    """Near-diagonal input (off-norm at round-off) must exit quickly
    AND exactly preserve the diagonal as eigenvalues."""
    n, b = 4, 130
    d = rng.standard_normal((b, n))
    full = np.einsum("...i,ij->...ij", d, np.eye(n))
    full = full + rng.standard_normal((b, n, n)) * 1e-18
    full = 0.5 * (full + np.swapaxes(full, -1, -2))
    compact = np.ascontiguousarray(
        np.asarray(full_to_sym(jnp.asarray(full))).T)
    got = np.sort(np.asarray(eig_sym_cf(jnp.asarray(compact), block=128)).T, -1)
    np.testing.assert_allclose(got, np.sort(d, -1), rtol=1e-12, atol=1e-15)
