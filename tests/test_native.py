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


@pytest.mark.parametrize("n", [2, 4, 6, 12])
def test_native_chains(n, rng):
    """Fused-iteration chain entry points (CPU analogs of the Pallas
    chain kernels): solve chain, matvec chain, and the Neumann limit."""
    full, compact = randsym(rng, 200, n)  # SPD (diag-shifted)
    v = rng.standard_normal((200, n))
    k = 6
    got = native.sym_solve_chain_np(compact, v, k, add=v)
    x = v.copy()
    for _ in range(k):
        x = np.linalg.solve(full, x[..., None])[..., 0] + v
    np.testing.assert_allclose(got, x, rtol=1e-10, atol=1e-12)
    # contraction scaling from the actual spectrum (Wishart lambda_max
    # fluctuates well past its ~4n typical value in a 200-batch)
    sc = 0.8 / np.abs(np.linalg.eigvalsh(full)).max()
    got = native.sym_matvec_chain_np(compact * sc, v, k, add=v)
    x = v.copy()
    for _ in range(k):
        x = np.einsum("bij,bj->bi", full * sc, x) + v
    np.testing.assert_allclose(got, x, rtol=1e-10, atol=1e-12)
    # Neumann limit: (I - sA)^-1 v
    got = native.sym_matvec_chain_np(compact * sc, v, 400, add=v)
    want = np.linalg.solve(np.eye(n) - full * sc, v[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)


def test_native_maxeig(rng):
    n, b = 5, 300
    full, compact = randsym(rng, b, n)
    u = rng.standard_normal((b, n))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    boost = 8.0 * n * np.einsum("bi,bj->bij", u, u)
    full = full + boost
    rows, cols = np.triu_indices(n, 1)
    compact = np.concatenate(
        [full[..., np.arange(n), np.arange(n)], full[..., rows, cols]], -1)
    mu, v = native.sym_maxeig_np(compact, iters=120, return_vector=True)
    w = np.linalg.eigvalsh(full)
    dom = w[np.arange(b), np.argmax(np.abs(w), -1)]
    np.testing.assert_allclose(mu, dom, rtol=1e-9)
    res = np.linalg.norm(
        np.einsum("bij,bj->bi", full, v) - mu[:, None] * v, axis=-1)
    assert res.max() < 1e-7 * np.abs(dom).max()
    # matches the jax/pallas public op on the same inputs
    from fastmath_tpu.ops.sym import sym_maxeig

    rs = np.random.RandomState(0)
    v0 = rs.standard_normal(n)
    mu_jax = np.asarray(sym_maxeig(jnp.asarray(compact), iters=120,
                                   v0=jnp.asarray(v0)))
    mu_nat = native.sym_maxeig_np(compact, iters=120, v0=v0)
    np.testing.assert_allclose(mu_nat, mu_jax, rtol=1e-11, atol=1e-12)


def test_native_accmatvec_broadcast(rng):
    """acc broadcasts to the vec batch like _chain_np's add (round-3
    review: a shared (n,) acc previously raised at reshape)."""
    n = 4
    full, compact = randsym(rng, 32, n, np.float64)
    vec = rng.standard_normal((32, n))
    acc = rng.standard_normal((n,))  # shared across the batch
    mv = np.einsum("...ij,...j->...i", full, vec)
    np.testing.assert_allclose(
        native.sym_addmatvec_np(acc, compact, vec), acc + mv,
        rtol=1e-10, atol=1e-10)
