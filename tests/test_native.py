"""Tests for the native C++ CPU kernels (ctypes tier)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastmath_tpu import native
from fastmath_tpu.layouts import full_to_sym

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library failed to build"
)


def randsym(rng, b, n, dtype=np.float64):
    full = rng.standard_normal((b, n, n)).astype(dtype)
    full = np.einsum("...ij,...kj->...ik", full, full) + n * np.eye(n, dtype=dtype)
    compact = np.asarray(full_to_sym(jnp.asarray(full)))
    return full, compact


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_native_matvec(n, dtype, rng):
    full, compact = randsym(rng, 200, n, dtype)
    vec = rng.standard_normal((200, n)).astype(dtype)
    got = native.sym_matvec_np(compact, vec)
    want = np.einsum("...ij,...j->...i", full, vec)
    rtol = 1e-10 if dtype == np.float64 else 1e-4
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 8, 16])
def test_native_solve(n, rng):
    full, compact = randsym(rng, 100, n)
    vec = rng.standard_normal((100, n))
    got = native.sym_solve_np(compact, vec)
    want = np.linalg.solve(full, vec[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6, 8, 16])
def test_native_invert(n, rng):
    from fastmath_tpu.layouts import sym_to_full

    full, compact = randsym(rng, 50, n)
    got = np.asarray(sym_to_full(jnp.asarray(native.sym_invert_np(compact))))
    np.testing.assert_allclose(got, np.linalg.inv(full), rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("n", [1, 3, 6])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_native_accmatvec(n, dtype, rng):
    """jitfields' fused accumulate entry points (reference sym.py:28-35)."""
    full, compact = randsym(rng, 150, n, dtype)
    vec = rng.standard_normal((150, n)).astype(dtype)
    acc = rng.standard_normal((150, n)).astype(dtype)
    mv = np.einsum("...ij,...j->...i", full, vec)
    rtol = 1e-10 if dtype == np.float64 else 1e-4
    np.testing.assert_allclose(
        native.sym_addmatvec_np(acc, compact, vec), acc + mv,
        rtol=rtol, atol=rtol)
    np.testing.assert_allclose(
        native.sym_submatvec_np(acc, compact, vec), acc - mv,
        rtol=rtol, atol=rtol)


def test_threads():
    native.set_num_threads(1)
    assert native.get_num_threads() >= 1


def test_matches_jax_path(rng):
    from fastmath_tpu.ops import sym as F

    full, compact = randsym(rng, 64, 4)
    vec = rng.standard_normal((64, 4))
    got = native.sym_solve_np(compact, vec)
    want = np.asarray(F.sym_solve(jnp.asarray(compact), jnp.asarray(vec)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-11)
