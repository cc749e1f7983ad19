"""Tests for simplex ops: implicit-class semantics, inverses, gradients."""
import numpy as np
import scipy.special as sps
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.ops import simplex as S


def test_logsumexp_explicit(rng):
    x = rng.standard_normal((4, 7)) * 5
    got = np.asarray(S.logsumexp(jnp.asarray(x), dim=-1))
    np.testing.assert_allclose(got, sps.logsumexp(x, axis=-1), rtol=1e-12)
    got = np.asarray(S.logsumexp(jnp.asarray(x), dim=0, keepdim=True))
    assert got.shape == (1, 7)
    np.testing.assert_allclose(got[0], sps.logsumexp(x, axis=0), rtol=1e-12)


def test_logsumexp_implicit(rng):
    x = rng.standard_normal((4, 7)) * 5
    got = np.asarray(S.logsumexp(jnp.asarray(x), dim=-1, implicit=True))
    xz = np.concatenate([x, np.zeros((4, 1))], axis=-1)
    np.testing.assert_allclose(got, sps.logsumexp(xz, axis=-1), rtol=1e-12)


def test_logsumexp_grad(rng):
    x = jnp.asarray(rng.standard_normal((3, 5)))
    for implicit in [False, True]:
        g = jax.grad(lambda t: jnp.sum(S.logsumexp(t, implicit=implicit)))(x)
        xz = np.concatenate([np.asarray(x), np.zeros((3, 1))], -1) if implicit \
            else np.asarray(x)
        want = sps.softmax(xz, axis=-1)
        if implicit:
            want = want[:, :-1]
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-10)


def test_softmax_explicit(rng):
    x = rng.standard_normal((4, 6)) * 3
    got = np.asarray(S.softmax(jnp.asarray(x), dim=-1))
    np.testing.assert_allclose(got, sps.softmax(x, axis=-1), rtol=1e-12)


@pytest.mark.parametrize("index", [0, 2, -1])
def test_softmax_implicit_in(index, rng):
    x = rng.standard_normal((4, 5)) * 3
    got = np.asarray(S.softmax(jnp.asarray(x), implicit=(True, False),
                               implicit_index=index))
    assert got.shape == (4, 6)
    # oracle: softmax over [x, 0] with zero channel moved to `index`
    xz = np.concatenate([x, np.zeros((4, 1))], axis=-1)
    p = sps.softmax(xz, axis=-1)
    idx = index % 6
    order = list(range(5))
    order.insert(idx, 5)
    np.testing.assert_allclose(got, p[:, order], rtol=1e-10)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-12)


def test_softmax_implicit_out(rng):
    x = rng.standard_normal((4, 6)) * 3
    got = np.asarray(S.softmax(jnp.asarray(x), implicit=(False, True),
                               implicit_index=1))
    p = sps.softmax(x, axis=-1)
    np.testing.assert_allclose(got, np.delete(p, 1, axis=-1), rtol=1e-12)


def test_softmax_roundtrip_logit(rng):
    # logit(softmax(x, implicit=True), implicit=True) == x
    x = rng.standard_normal((4, 5))
    xs = jnp.asarray(x)
    p = S.softmax(xs, implicit=True)
    back = np.asarray(S.logit(p, implicit=True))
    np.testing.assert_allclose(back, x, rtol=1e-9, atol=1e-9)
    # softmax(logit(p, implicit=False), implicit=False) == p
    p = sps.softmax(rng.standard_normal((4, 5)), axis=-1)
    lg = S.logit(jnp.asarray(p), implicit=False)
    np.testing.assert_allclose(np.asarray(S.softmax(lg)), p, rtol=1e-9)


def test_logit_explicit_reference_channel(rng):
    p = sps.softmax(rng.standard_normal((3, 4)), axis=-1)
    got = np.asarray(S.logit(jnp.asarray(p), implicit_index=2))
    want = np.log(p) - np.log(p[:, 2:3])
    np.testing.assert_allclose(got, want, rtol=1e-10)
    np.testing.assert_allclose(got[:, 2], 0.0, atol=1e-12)


def test_log_softmax(rng):
    x = rng.standard_normal((4, 6)) * 3
    got = np.asarray(S.log_softmax(jnp.asarray(x)))
    np.testing.assert_allclose(got, sps.log_softmax(x, axis=-1), rtol=1e-10)
    got = np.asarray(S.log_softmax(jnp.asarray(x[:, :5]), implicit=(True, False)))
    xz = np.concatenate([np.zeros((4, 1)), x[:, :5]], axis=-1)
    np.testing.assert_allclose(got, sps.log_softmax(xz, axis=-1), rtol=1e-10)


def test_softmax_grad_matches_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((3, 5)))
    w = jnp.asarray(rng.standard_normal((3, 5)))

    def loss_custom(t):
        return jnp.sum(S.softmax(t) * w)

    def loss_ref(t):
        return jnp.sum(jax.nn.softmax(t, axis=-1) * w)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_custom)(x)),
        np.asarray(jax.grad(loss_ref)(x)), rtol=1e-9)


def test_softmax_implicit_grad_fd(rng):
    x = jnp.asarray(rng.standard_normal((2, 4)))
    w = jnp.asarray(rng.standard_normal((2, 5)))

    def loss(t):
        return jnp.sum(S.softmax(t, implicit=(True, False)) * w)

    g = jax.grad(loss)(x)
    h = 1e-6
    for idx in [(0, 0), (1, 3)]:
        e = jnp.zeros_like(x).at[idx].set(h)
        fd = (loss(x + e) - loss(x - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd), rtol=1e-5)


def test_softmax_lse(rng):
    x = rng.standard_normal((4, 6)) * 2
    w = rng.random((4, 1))
    p, lse = S.softmax_lse(jnp.asarray(x), weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(p), sps.softmax(x, axis=-1), rtol=1e-10)
    want = (sps.logsumexp(x, axis=-1, keepdims=True) * w).sum()
    np.testing.assert_allclose(float(lse), want, rtol=1e-10)
    # implicit in, explicit out appends background as the LAST class
    p, lse = S.softmax_lse(jnp.asarray(x), implicit=(True, False))
    xz = np.concatenate([x, np.zeros((4, 1))], axis=-1)
    np.testing.assert_allclose(np.asarray(p), sps.softmax(xz, axis=-1), rtol=1e-10)
    np.testing.assert_allclose(float(lse), sps.logsumexp(xz, axis=-1).sum(), rtol=1e-10)
