"""Parity tests for batched small-matrix ops vs numpy oracles.

Mirrors the reference's test_batched.py strategy (batchdet vs det,
batchinv vs inv with diagonally-dominant inputs, matvec vs matmul,
shapes 1x1..4x4 + non-square + broadcasting) and extends to the
chol/logdet/lmdiv/rmdiv suite.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fastmath_tpu.ops import batched as B

NS = [1, 2, 3, 4, 5, 8, 12]


def dom(rng, batch, n):
    a = rng.standard_normal((*batch, n, n))
    a[..., np.arange(n), np.arange(n)] += 10
    return a


@pytest.mark.parametrize("n", NS)
def test_batchdet(n, rng):
    a = dom(rng, (100,), n)
    got = np.asarray(B.batchdet(jnp.asarray(a)))
    np.testing.assert_allclose(got, np.linalg.det(a), rtol=1e-9)


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("regularize", [False, True])
def test_batchinv(n, regularize, rng):
    if regularize and n > 4:
        pytest.skip("regularizer only on the closed-form path")
    a = dom(rng, (100,), n)
    got = np.asarray(B.batchinv(jnp.asarray(a), regularize=regularize))
    np.testing.assert_allclose(got, np.linalg.inv(a), rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("m,n", [(1, 1), (2, 2), (3, 3), (4, 4), (4, 5), (6, 3)])
def test_batchmatvec(m, n, rng):
    mat = rng.standard_normal((7, m, n))
    vec = rng.standard_normal((7, n))
    got = np.asarray(B.batchmatvec(jnp.asarray(mat), jnp.asarray(vec)))
    np.testing.assert_allclose(got, np.einsum("...ij,...j->...i", mat, vec),
                               rtol=1e-12)


def test_batchmatvec_broadcast(rng):
    mat = rng.standard_normal((1, 5, 3, 3))
    vec = rng.standard_normal((4, 1, 3))
    got = np.asarray(B.batchmatvec(jnp.asarray(mat), jnp.asarray(vec)))
    assert got.shape == (4, 5, 3)
    want = np.einsum("...ij,...j->...i", mat, vec[:, None, 0])
    np.testing.assert_allclose(got, np.einsum("xyij,xyj->xyi",
                                              np.broadcast_to(mat, (4, 5, 3, 3)),
                                              np.broadcast_to(vec[:, :, :], (4, 5, 3))),
                               rtol=1e-12)


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("rhs", ["vec", "mat"])
def test_batchlmdiv(n, rhs, rng):
    a = dom(rng, (50,), n)
    b = rng.standard_normal((50, n) if rhs == "vec" else (50, n, 2))
    got = np.asarray(B.batchlmdiv(jnp.asarray(a), jnp.asarray(b)))
    if rhs == "vec":
        want = np.linalg.solve(a, b[..., None])[..., 0]
    else:
        want = np.linalg.solve(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_batchrmdiv(n, rng):
    a = rng.standard_normal((20, 3, n))
    b = dom(rng, (20,), n)
    got = np.asarray(B.batchrmdiv(jnp.asarray(a), jnp.asarray(b)))
    want = a @ np.linalg.inv(b)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6, 8, 12, 16])
def test_batchchol(n, rng):
    a = rng.standard_normal((30, n, n))
    a = a @ np.swapaxes(a, -1, -2) + n * np.eye(n)
    got = np.asarray(B.batchchol(jnp.asarray(a)))
    want = np.linalg.cholesky(a)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 8, 16])
def test_batchlogdet(n, rng):
    a = rng.standard_normal((30, n, n))
    a = a @ np.swapaxes(a, -1, -2) + n * np.eye(n)
    got = np.asarray(B.batchlogdet(jnp.asarray(a)))
    want = np.linalg.slogdet(a)[1]
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_grad_through_closed_forms(rng):
    import jax

    a = dom(rng, (5,), 3)

    def loss(m):
        return jnp.sum(B.batchinv(m) ** 2) + jnp.sum(B.batchlogdet(m))

    g = jax.grad(loss)(jnp.asarray(a))
    a0 = jnp.asarray(a)
    h = 1e-6
    e = jnp.zeros_like(a0).at[2, 1, 0].set(h)
    fd = (loss(a0 + e) - loss(a0 - e)) / (2 * h)
    np.testing.assert_allclose(np.asarray(g[2, 1, 0]), np.asarray(fd), rtol=1e-5)


class TestBatchMatmul:
    """batchmatmul: resurrected north-star extension (the reference
    removed it, batched.py:10-12); unrolled tiny-dim path vs einsum."""

    def test_small_matches_numpy(self, rng):
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchmatmul

        for m, k, n in [(1, 1, 1), (2, 3, 4), (4, 4, 4), (6, 6, 6), (3, 5, 2)]:
            a = rng.standard_normal((40, m, k))
            b = rng.standard_normal((40, k, n))
            got = np.asarray(batchmatmul(jnp.asarray(a), jnp.asarray(b)))
            np.testing.assert_allclose(got, a @ b, rtol=1e-12, atol=1e-12)

    def test_large_path(self, rng):
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchmatmul

        a = rng.standard_normal((7, 9, 11))
        b = rng.standard_normal((7, 11, 8))
        got = np.asarray(batchmatmul(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, a @ b, rtol=1e-10)

    def test_broadcast_and_grad(self, rng):
        import jax
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchmatmul

        a = jnp.asarray(rng.standard_normal((3, 3)))
        b = jnp.asarray(rng.standard_normal((5, 3, 3)))
        got = np.asarray(batchmatmul(a, b))
        np.testing.assert_allclose(got, np.asarray(a) @ np.asarray(b),
                                   rtol=1e-12)
        g = jax.grad(lambda x: jnp.sum(batchmatmul(x, b) ** 2))(a)
        gw = jax.grad(lambda x: jnp.sum((x @ b) ** 2))(a)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gw), rtol=1e-10)

    def test_mismatch_raises(self):
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchmatmul

        with pytest.raises(ValueError):
            batchmatmul(jnp.zeros((2, 3)), jnp.zeros((4, 2)))


class TestUnrolledPLU:
    """n in (5..8): trace-time unrolled partially-pivoted LU; n in
    (9..16): the fori_loop-rolled variant (same one-hot elimination,
    O(1) compile)."""

    @pytest.mark.parametrize("n", [5, 6, 8, 12, 16])
    def test_det_inv_logdet(self, n, rng):
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchdet, batchinv, batchlogdet

        a = rng.standard_normal((60, n, n)) + n * np.eye(n)
        aj = jnp.asarray(a)
        np.testing.assert_allclose(np.asarray(batchdet(aj)),
                                   np.linalg.det(a), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(batchinv(aj)),
                                   np.linalg.inv(a), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(batchlogdet(aj)),
                                   np.linalg.slogdet(a)[1], rtol=1e-9)

    @pytest.mark.parametrize("n", [5, 7, 13])
    def test_lmdiv(self, n, rng):
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchlmdiv

        a = rng.standard_normal((40, n, n)) + n * np.eye(n)
        bv = rng.standard_normal((40, n))
        bm = rng.standard_normal((40, n, 3))
        xv = np.asarray(batchlmdiv(jnp.asarray(a), jnp.asarray(bv)))
        np.testing.assert_allclose(
            xv, np.linalg.solve(a, bv[..., None])[..., 0], rtol=1e-8,
            atol=1e-10)
        xm = np.asarray(batchlmdiv(jnp.asarray(a), jnp.asarray(bm)))
        np.testing.assert_allclose(xm, np.linalg.solve(a, bm), rtol=1e-8,
                                   atol=1e-10)

    def test_pivoting_zero_leading_minor(self, rng):
        # a[0, 0] = 0 defeats unpivoted LU; partial pivoting must not
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchdet, batchinv

        n = 6
        a = rng.standard_normal((30, n, n))
        a[:, 0, 0] = 0.0
        a[:, 1, 1] = 0.0
        aj = jnp.asarray(a)
        np.testing.assert_allclose(np.asarray(batchdet(aj)),
                                   np.linalg.det(a), rtol=1e-7)
        got = np.asarray(batchinv(aj))
        np.testing.assert_allclose(
            np.einsum("...ij,...jk->...ik", a, got),
            np.broadcast_to(np.eye(n), a.shape), atol=1e-8)

    def test_grad(self, rng):
        import jax
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchlogdet

        n = 5
        a = rng.standard_normal((20, n, n)) + n * np.eye(n)
        aj = jnp.asarray(a)
        g = jax.grad(lambda x: jnp.sum(batchlogdet(x)))(aj)
        # d logdet / dA = inv(A)^T
        np.testing.assert_allclose(
            np.asarray(g), np.swapaxes(np.linalg.inv(a), -1, -2),
            rtol=1e-7, atol=1e-9)

    def test_broadcast_lmdiv(self, rng):
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchlmdiv

        n = 5
        a = rng.standard_normal((n, n)) + n * np.eye(n)
        b = rng.standard_normal((7, n, 2))
        x = np.asarray(batchlmdiv(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(
            x, np.linalg.solve(np.broadcast_to(a, (7, n, n)), b),
            rtol=1e-8, atol=1e-10)


class TestReviewRegressions:
    """Round-3 code-review findings (routing contracts + overflow)."""

    def test_logdet_pallas_f32_overflow_free(self, rng):
        """log of the product overflows f32 where the sum of logs does
        not — the 5<=n<=8 and n<=4 kernel tiers must accumulate per
        pivot like the XLA tier (8x8 scaled so |det| ~ 6e53)."""
        import jax.numpy as jnp
        from fastmath_tpu.ops.batched import batchlogdet

        for n in (4, 8):
            a = rng.standard_normal((64, n, n))
            a = (np.einsum("...ij,...kj->...ik", a, a)
                 + n * np.eye(n)) * 4e5
            want = np.linalg.slogdet(a.astype(np.float64))[1]
            got = np.asarray(
                batchlogdet(jnp.asarray(a, jnp.float32),
                            backend="pallas"), np.float64)
            assert np.isfinite(got).all()
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_lmdiv_forced_pallas_raises(self, rng):
        import jax.numpy as jnp
        import pytest
        from fastmath_tpu.ops.batched import batchlmdiv

        n = 8
        a = jnp.asarray(rng.standard_normal((10, n, n)) + n * np.eye(n))
        b = jnp.asarray(rng.standard_normal((10, n)))
        with pytest.raises(ValueError):
            batchlmdiv(a, b, regularize=True, backend="pallas")
        b9 = jnp.asarray(rng.standard_normal((10, n, 9)))
        with pytest.raises(ValueError):
            batchlmdiv(a, b9, backend="pallas")  # k=9 > cap 8 at n=8

    def test_chol_forced_pallas_rolled_and_cap(self, rng):
        import jax.numpy as jnp
        import pytest
        from fastmath_tpu.ops.batched import batchchol

        # 9 <= n <= 32 is served by the rolled stacked-grid tier
        a = rng.standard_normal((4, 9, 9))
        a = jnp.asarray(np.einsum("...ij,...kj->...ik", a, a)
                        + 9 * np.eye(9))
        got = np.asarray(batchchol(a, backend="pallas"))
        np.testing.assert_allclose(
            got, np.linalg.cholesky(np.asarray(a, np.float64)),
            rtol=1e-4, atol=1e-5)
        assert np.triu(got, 1).max() == 0.0  # exact zeros above diag
        big = rng.standard_normal((2, 33, 33))
        big = jnp.asarray(np.einsum("...ij,...kj->...ik", big, big)
                          + 33 * np.eye(33))
        with pytest.raises(ValueError, match="n <= 32"):
            batchchol(big, backend="pallas")
