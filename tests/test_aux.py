"""Tests for auxiliary subsystems: utils, typing, checks, profiling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu import utils as U
from fastmath_tpu.core import checks as C


def test_ensure_list():
    assert U.ensure_list(3) == [3]
    assert U.ensure_list([1, 2], 4) == [1, 2, 2, 2]
    assert U.ensure_list((1, 2, 3), 2) == [1, 2]


def test_slice_tensor(rng):
    x = jnp.asarray(rng.standard_normal((4, 5, 6)))
    np.testing.assert_array_equal(
        np.asarray(U.fast_slice_tensor(x, 2, dim=1)), np.asarray(x)[:, 2])
    got = U.slice_tensor(x, (slice(1, 3), 0), dim=(0, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x)[1:3, :, 0])


def test_cumprod():
    assert U.cumprod([2, 3, 4]) == [2, 6, 24]
    assert U.cumprod([2, 3, 4], reverse=True) == [24, 12, 4]
    assert U.cumprod([2, 3, 4], exclusive=True) == [1, 2, 6]
    assert U.cumprod([2, 3, 4], reverse=True, exclusive=True) == [12, 4, 1]


def test_sub2ind_ind2sub(rng):
    shape = (3, 4, 5)
    flat = jnp.arange(60)
    subs = U.ind2sub(flat, shape)
    back = U.sub2ind([subs[i] for i in range(3)], shape)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(flat))
    np.testing.assert_array_equal(
        np.asarray(subs).T, np.stack(np.unravel_index(np.arange(60), shape), -1))


def test_eps():
    assert U.eps(jnp.float32) == np.finfo(np.float32).eps
    assert U.eps(jnp.complex128) == np.finfo(np.float64).eps
    with pytest.raises(TypeError):
        U.eps(jnp.int32)


def test_broadcast_backward(rng):
    g = jnp.asarray(rng.standard_normal((4, 3, 5)))
    out = U.broadcast_backward(g, (3, 1))
    assert out.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(g).sum(0).sum(-1, keepdims=True))


def test_checked_nan_tripwire():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = C.checked(jax.jit(bad))
    f(jnp.asarray([1.0, 2.0]))  # fine
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))


def test_assert_finite():
    C.assert_finite(jnp.asarray([1.0, 2.0]))
    with pytest.raises(ValueError):
        C.assert_finite(jnp.asarray([jnp.nan]))


def test_device_timer(rng):
    from fastmath_tpu.utils.profiling import device_timer

    sink = []
    with device_timer("x", sink=sink) as t:
        t.result = jnp.sum(jnp.asarray(rng.standard_normal(1000)) ** 2)
    assert sink and sink[0][0] == "x" and sink[0][1] > 0


def test_typing():
    from fastmath_tpu.typing import OneOrSeveral, OneOrTwo  # noqa: F401
