"""Parity tests for special functions vs scipy oracles (fp64/fp32/bf16)."""
import numpy as np
import scipy.special as sps
import jax.numpy as jnp
import pytest

from fastmath_tpu.ops import special as S


def test_mvdigamma():
    x = np.linspace(2.1, 20, 50)  # keep x + (1-p)/2 > 0 for order <= 5
    for order in [1, 2, 3, 5]:
        got = np.asarray(S.mvdigamma(jnp.asarray(x), order=order))
        want = sum(sps.digamma(x + (1 - p) / 2) for p in range(1, order + 1))
        np.testing.assert_allclose(got, want, rtol=1e-10)


@pytest.mark.parametrize("nu", [0, 1])
@pytest.mark.parametrize("mode", [None, "norm", "log"])
def test_besseli_01(nu, mode, rng):
    z = np.concatenate([np.linspace(0.01, 10, 40), np.linspace(10, 100, 20)])
    got = np.asarray(S.besseli(nu, jnp.asarray(z), mode=mode))
    iv = sps.iv(nu, z)
    want = {None: iv, "norm": iv * np.exp(-z), "log": np.log(iv)}[mode]
    # large-z besseli overflows in scipy too; compare where finite
    ok = np.isfinite(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-6)


@pytest.mark.parametrize("nu", [2.0, 3.5, 7.0, 14.9, 15.0, 25.0])
@pytest.mark.parametrize("mode", ["log", "norm"])
def test_besseli_any(nu, mode):
    z = np.concatenate([np.linspace(0.05, 5, 30), np.linspace(5, 200, 40)])
    got = np.asarray(S.besseli(nu, jnp.asarray(z), mode=mode))
    if mode == "log":
        want = np.log(sps.ive(nu, z)) + z  # stable log I_nu
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    else:
        want = sps.ive(nu, z)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_besseli_grad_clean():
    import jax

    # double-where must keep gradients NaN-free on both sides of the branch
    for nu in [3.0, 25.0]:
        g = jax.grad(lambda z: jnp.sum(S.besseli(nu, z, mode="log")))(
            jnp.asarray([0.5, 5.0, 50.0, 150.0])
        )
        assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("nu", [0.0, 1.0, 2.5, 10.0])
def test_besseli_ratio(nu):
    x = np.linspace(0.1, 50, 60)
    got = np.asarray(S.besseli_ratio(nu, jnp.asarray(x)))
    want = sps.ive(nu + 1, x) / sps.ive(nu, x)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_erfinv():
    x = np.linspace(-0.999, 0.999, 101)
    got = np.asarray(S.erfinv(jnp.asarray(x)))
    np.testing.assert_allclose(got, sps.erfinv(x), rtol=1e-6, atol=1e-9)


def test_gammainc():
    a = np.asarray([0.5, 1.0, 2.5, 10.0])[:, None]
    x = np.linspace(0.01, 20, 50)[None, :]
    got = np.asarray(S.gammainc(jnp.asarray(np.broadcast_to(a, (4, 50))),
                                jnp.asarray(np.broadcast_to(x, (4, 50)))))
    np.testing.assert_allclose(got, sps.gammainc(a, x), rtol=1e-5, atol=1e-7)
    got = np.asarray(S.gammaincc(jnp.asarray(np.broadcast_to(a, (4, 50))),
                                 jnp.asarray(np.broadcast_to(x, (4, 50)))))
    np.testing.assert_allclose(got, sps.gammaincc(a, x), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("nu", [0, 1, 2.5, 15.0, 30.0])
def test_besseli_fp32_parity(nu):
    """fp32 parity gate (BASELINE configs[3]): rel-err <= 1e-5 vs scipy
    in the numerically meaningful 'norm' (exp-scaled) mode."""
    z32 = np.concatenate([np.linspace(0.05, 5, 30),
                          np.linspace(5, 150, 40)]).astype(np.float32)
    got = np.asarray(S.besseli(nu, jnp.asarray(z32), mode="norm"),
                     dtype=np.float64)
    want = sps.ive(nu, z32.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-8)


def test_erfinv_gammainc_fp32():
    x32 = np.linspace(-0.99, 0.99, 81, dtype=np.float32)
    got = np.asarray(S.erfinv(jnp.asarray(x32)), dtype=np.float64)
    np.testing.assert_allclose(got, sps.erfinv(x32.astype(np.float64)),
                               rtol=2e-5, atol=1e-6)
    a32 = np.full(50, 2.5, dtype=np.float32)
    x32 = np.linspace(0.01, 20, 50, dtype=np.float32)
    got = np.asarray(S.gammainc(jnp.asarray(a32), jnp.asarray(x32)))
    np.testing.assert_allclose(got, sps.gammainc(2.5, x32.astype(np.float64)),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("fn,args", [
    ("besseli", (0,)),
    ("besseli", (3.5,)),
    ("erfinv", ()),
])
def test_bf16_parity(fn, args):
    # bf16 inputs upcast internally: results should match f32-computed
    # values to bf16 resolution
    x32 = np.linspace(0.05, 0.9, 20, dtype=np.float32) * (10 if fn == "besseli" else 1)
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    f = getattr(S, fn)
    got = np.asarray(f(*args, xb).astype(jnp.float32))
    want = np.asarray(f(*args, jnp.asarray(np.asarray(xb, dtype=np.float32))))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
    assert f(*args, xb).dtype == jnp.bfloat16
