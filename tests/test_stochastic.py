"""Statistical tests for stochastic estimators (seeded, tolerance-based)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.ops import stochastic as ST


def spd(rng, n, cond=10.0):
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.linspace(1.0, cond, n)
    return (q * lam) @ q.T


def test_trapprox_exact_rademacher_diagonal(rng):
    # For diagonal A, Hutchinson with Rademacher probes is exact per probe
    d = jnp.asarray(rng.random(50) + 0.5)
    mv = lambda x: d * x
    t = ST.trapprox(mv, shape=(50,), samples=3, key=jax.random.key(1))
    np.testing.assert_allclose(float(t), float(jnp.sum(d)), rtol=1e-10)


def test_trapprox_tensor_input(rng):
    a = spd(rng, 40)
    t = ST.trapprox(jnp.asarray(a), samples=600, key=jax.random.key(2))
    np.testing.assert_allclose(float(t), np.trace(a), rtol=0.1)


def test_trapprox_moments(rng):
    a = spd(rng, 30)
    t = ST.trapprox(jnp.asarray(a), moments=3, samples=800,
                    key=jax.random.key(3))
    assert t.shape == (3,)
    for j in range(3):
        want = np.trace(np.linalg.matrix_power(a, j + 1))
        np.testing.assert_allclose(float(t[j]), want, rtol=0.15)


def test_trapprox_hutchpp(rng):
    a = spd(rng, 40, cond=100)
    t = ST.trapprox(jnp.asarray(a), samples=60, hutchpp=True,
                    key=jax.random.key(4))
    np.testing.assert_allclose(float(t), np.trace(a), rtol=0.05)


def test_trapprox_gaussian(rng):
    a = spd(rng, 30)
    t = ST.trapprox(jnp.asarray(a), samples=2000, method="gaussian",
                    key=jax.random.key(5))
    np.testing.assert_allclose(float(t), np.trace(a), rtol=0.15)


def test_maxeig_power(rng):
    a = spd(rng, 30, cond=50)
    mu = ST.maxeig_power(jnp.asarray(a), key=jax.random.key(6))
    np.testing.assert_allclose(float(mu), np.linalg.eigvalsh(a).max(),
                               rtol=1e-4)


def test_maxeig_power_callable(rng):
    a = spd(rng, 20)
    aj = jnp.asarray(a)
    mu = ST.maxeig_power(lambda x: aj @ x, shape=(20,), key=jax.random.key(7))
    np.testing.assert_allclose(float(mu), np.linalg.eigvalsh(a).max(),
                               rtol=1e-4)


def test_vbald(rng):
    a = spd(rng, 60, cond=20)
    got = ST.vbald(jnp.asarray(a), mc_samples=512, samples=20,
                   key=jax.random.key(8))
    want = np.linalg.slogdet(a)[1]
    # stochastic estimator: loose relative tolerance
    np.testing.assert_allclose(float(got), want, rtol=0.35)


def test_keys_reproducible(rng):
    a = spd(rng, 20)
    t1 = ST.trapprox(jnp.asarray(a), samples=5, key=jax.random.key(9))
    t2 = ST.trapprox(jnp.asarray(a), samples=5, key=jax.random.key(9))
    assert float(t1) == float(t2)
    t3 = ST.trapprox(jnp.asarray(a), samples=5, key=jax.random.key(10))
    assert float(t1) != float(t3)
