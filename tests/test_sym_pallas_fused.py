"""Tests for the fused accumulate / outer / det compact-sym Pallas
kernels (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.kernels import (
    sym_addmatvec_cf,
    sym_submatvec_cf,
    sym_outer_cf,
    sym_det_cf,
)
from fastmath_tpu.layouts import full_to_sym


def spd_cf(rng, b, n):
    a = rng.standard_normal((b, n, n))
    spd = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n)
    cf = np.ascontiguousarray(np.asarray(full_to_sym(jnp.asarray(spd))).T)
    return spd, cf


@pytest.mark.parametrize("n", [2, 3, 4])
@pytest.mark.parametrize("sign", [1, -1])
def test_accmatvec(n, sign, rng):
    spd, cf = spd_cf(rng, 260, n)
    acc = rng.standard_normal((260, n))
    v = rng.standard_normal((260, n))
    fn = sym_addmatvec_cf if sign > 0 else sym_submatvec_cf
    got = np.asarray(
        fn(jnp.asarray(acc.T.copy()), jnp.asarray(cf),
           jnp.asarray(v.T.copy()), block=128)
    ).T
    want = acc + sign * np.einsum("...ij,...j->...i", spd, v)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_outer(n, rng):
    x = rng.standard_normal((300, n))
    got = np.asarray(sym_outer_cf(jnp.asarray(x.T.copy()), block=128)).T
    want = np.asarray(full_to_sym(jnp.asarray(
        np.einsum("...i,...j->...ij", x, x))))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 8])
def test_det(n, rng):
    spd, cf = spd_cf(rng, 300, n)
    got = np.asarray(sym_det_cf(jnp.asarray(cf), block=256))
    np.testing.assert_allclose(got, np.linalg.det(spd), rtol=1e-10)


def test_accmatvec_grad(rng):
    n = 3
    spd, cf = spd_cf(rng, 130, n)
    acc = jnp.asarray(rng.standard_normal((n, 130)))
    v = jnp.asarray(rng.standard_normal((n, 130)))
    m = jnp.asarray(cf)
    co = jnp.asarray(rng.standard_normal((n, 130)))

    def ours(acc, m, v):
        return jnp.sum(co * sym_submatvec_cf(acc, m, v, block=128))

    from fastmath_tpu.layouts import sym_to_full

    def ref(acc, m, v):
        full = sym_to_full(m.T)
        mv = jnp.einsum("...ij,...j->...i", full, v.T)
        return jnp.sum(co * (acc - mv.T.astype(acc.dtype)))

    g = jax.grad(ours, argnums=(0, 1, 2))(acc, m, v)
    gw = jax.grad(ref, argnums=(0, 1, 2))(acc, m, v)
    for a, b in zip(g, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)


def test_outer_grad(rng):
    n = 4
    x = jnp.asarray(rng.standard_normal((n, 130)))
    co = jnp.asarray(rng.standard_normal((n * (n + 1) // 2, 130)))

    def ours(x):
        return jnp.sum(co * sym_outer_cf(x, block=128))

    def ref(x):
        outer = jnp.einsum("...i,...j->...ij", x.T, x.T)
        return jnp.sum(co * full_to_sym(outer).T)

    g = jax.grad(ours)(x)
    gw = jax.grad(ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n", [3, 6])
def test_det_grad(rng, n):
    spd, cf = spd_cf(rng, 130, n)
    m = jnp.asarray(cf)

    from fastmath_tpu.layouts import sym_to_full

    g = jax.grad(lambda m: jnp.sum(sym_det_cf(m, block=128)))(m)
    gw = jax.grad(
        lambda m: jnp.sum(jnp.linalg.det(sym_to_full(m.T)))
    )(m)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw),
                               rtol=1e-8, atol=1e-10)


class TestJhJ:
    """sym_matmul_cf: channel-first congruence product + compact VJP."""

    @pytest.mark.parametrize("k,d", [(2, 2), (3, 3), (4, 4), (4, 2), (2, 4), (5, 5), (6, 6), (6, 3)])
    def test_forward(self, k, d, rng):
        from fastmath_tpu.kernels import sym_matmul_cf
        from fastmath_tpu.ops.sym import sym_matmul

        J = rng.standard_normal((200, k, d))
        Hc = rng.standard_normal((200, k * (k + 1) // 2))
        jcf = jnp.asarray(np.ascontiguousarray(J.reshape(200, -1).T))
        hcf = jnp.asarray(np.ascontiguousarray(Hc.T))
        got = np.asarray(sym_matmul_cf(jcf, hcf, block=128)).T
        want = np.asarray(sym_matmul(jnp.asarray(J), jnp.asarray(Hc)))
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-13)

    def test_grad_vs_xla(self, rng):
        import jax
        from fastmath_tpu.kernels import sym_matmul_cf
        from fastmath_tpu.ops.sym import sym_matmul

        k = d = 3
        J = rng.standard_normal((60, k, d))
        Hc = rng.standard_normal((60, k * (k + 1) // 2))
        jcf = jnp.asarray(np.ascontiguousarray(J.reshape(60, -1).T))
        hcf = jnp.asarray(np.ascontiguousarray(Hc.T))
        co = jnp.asarray(rng.standard_normal((d * (d + 1) // 2, 60)))

        def ours(jc, hc):
            return jnp.sum(co * sym_matmul_cf(jc, hc, block=128))

        def ref(jc, hc):
            Jb = jc.T.reshape(-1, k, d)
            out = sym_matmul(Jb, hc.T)
            return jnp.sum(co * out.T)

        g = jax.grad(ours, argnums=(0, 1))(jcf, hcf)
        gw = jax.grad(ref, argnums=(0, 1))(jcf, hcf)
        for a, b in zip(g, gw):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-11)


# --- chain error-growth contract (round 5, VERDICT r4 next #7) --------------


@pytest.mark.parametrize("k", [8, 128])
def test_chain_error_growth(k, rng):
    """The documented law: normwise error vs the exact recurrence is
    median ~ sqrt(k)*eps and p99 ~ k*eps in f32 (rounding enters via
    per-step products — a random walk, not an accumulator). Gates both
    the public XLA scan and the fused kernel (interpret mode here;
    identical FMA algebra on hardware)."""
    from fastmath_tpu.ops.sym import sym_matvec_chain

    B, n = 4096, 4
    a = rng.standard_normal((B, n, n))
    A = np.einsum("...ij,...kj->...ik", a, a) / n + np.eye(n)
    w = np.linalg.eigvalsh(A)[:, -1]
    A = A * (0.98 / w)[:, None, None]
    v = rng.standard_normal((B, n))
    iu = np.triu_indices(n, 1)
    compact = np.concatenate(
        [np.diagonal(A, axis1=-2, axis2=-1), A[:, iu[0], iu[1]]], axis=-1)
    Af = jnp.asarray(compact.astype(np.float32))
    vf = jnp.asarray(v.astype(np.float32))
    x = v.copy()
    for _ in range(k):
        x = np.einsum("...ij,...j->...i", A, x)
    eps = 1.19e-7
    for backend in ("xla", "pallas"):
        got = np.asarray(
            sym_matvec_chain(Af, vf, iters=k, backend=backend), np.float64)
        nw = (np.linalg.norm(got - x, axis=-1)
              / np.linalg.norm(x, axis=-1))
        assert np.median(nw) < 2 * np.sqrt(k) * eps, (backend, np.median(nw))
        assert np.quantile(nw, 0.99) < 4 * k * eps, (
            backend, np.quantile(nw, 0.99))
