"""Parity tests for compact symmetric ops vs numpy/scipy oracles.

The reference only tested sym.* indirectly through jitfields' own suite
(SURVEY.md §4 coverage gaps); here every op gets a direct oracle test.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.layouts import compact_size, full_to_sym, sym_to_full
from fastmath_tpu.ops import sym as F


def random_sym(rng, batch, n, dtype=np.float64, spd=False):
    full = rng.standard_normal((*batch, n, n)).astype(dtype)
    if spd:
        full = np.einsum("...ij,...kj->...ik", full, full)
        full = full + n * np.eye(n, dtype=dtype)
    else:
        full = full + np.swapaxes(full, -1, -2)
    compact = np.asarray(full_to_sym(jnp.asarray(full)))
    return full, compact


NS = [1, 2, 3, 4, 5, 8]


@pytest.mark.parametrize("n", NS)
def test_sym_matvec(n, rng):
    full, compact = random_sym(rng, (7, 3), n)
    vec = rng.standard_normal((7, 3, n))
    got = np.asarray(F.sym_matvec(jnp.asarray(compact), jnp.asarray(vec)))
    want = np.einsum("...ij,...j->...i", full, vec)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("nn_kind", ["identity", "diag", "full"])
def test_sym_matvec_layouts(nn_kind, rng):
    n = 4
    vec = rng.standard_normal((5, n))
    if nn_kind == "identity":
        mat = rng.standard_normal((5, 1))
        want = mat * vec
    elif nn_kind == "diag":
        mat = rng.standard_normal((5, n))
        want = mat * vec
    else:
        mat = rng.standard_normal((5, n * n))
        want = np.einsum("...ij,...j->...i", mat.reshape(5, n, n), vec)
    got = np.asarray(F.sym_matvec(jnp.asarray(mat), jnp.asarray(vec)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("spd", [False, True])
def test_sym_solve(n, spd, rng):
    full, compact = random_sym(rng, (11,), n, spd=spd)
    if not spd:
        # keep away from singularity for the indefinite case
        full = full + 3 * n * np.eye(n)
        compact = np.asarray(full_to_sym(jnp.asarray(full)))
    vec = rng.standard_normal((11, n))
    got = np.asarray(F.sym_solve(jnp.asarray(compact), jnp.asarray(vec)))
    want = np.linalg.solve(full, vec[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_sym_solve_eps(rng):
    n = 3
    full, compact = random_sym(rng, (4,), n, spd=True)
    vec = rng.standard_normal((4, n))
    eps = [0.5, 1.5]  # broadcast last value -> [0.5, 1.5, 1.5]
    got = np.asarray(F.sym_solve(jnp.asarray(compact), jnp.asarray(vec), eps=eps))
    want = np.linalg.solve(full + np.diag([0.5, 1.5, 1.5]), vec[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_sym_solve_layouts(rng):
    n = 4
    vec = rng.standard_normal((6, n))
    diag = 1.0 + rng.random((6, n))
    got = np.asarray(F.sym_solve(jnp.asarray(diag), jnp.asarray(vec)))
    np.testing.assert_allclose(got, vec / diag, rtol=1e-12)
    scale = 1.0 + rng.random((6, 1))
    got = np.asarray(F.sym_solve(jnp.asarray(scale), jnp.asarray(vec)))
    np.testing.assert_allclose(got, vec / scale, rtol=1e-12)
    full = rng.standard_normal((6, n, n)) + 4 * np.eye(n)
    got = np.asarray(F.sym_solve(jnp.asarray(full.reshape(6, n * n)), jnp.asarray(vec)))
    want = np.linalg.solve(full, vec[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n", NS)
def test_sym_det(n, rng):
    full, compact = random_sym(rng, (9,), n, spd=True)
    got = np.asarray(F.sym_det(jnp.asarray(compact)))
    want = np.linalg.det(full)
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("diag", [False, True])
def test_sym_invert(n, diag, rng):
    full, compact = random_sym(rng, (9,), n, spd=True)
    got = np.asarray(F.sym_invert(jnp.asarray(compact), diag=diag))
    inv = np.linalg.inv(full)
    if diag:
        want = np.diagonal(inv, axis1=-2, axis2=-1)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    else:
        want = np.asarray(sym_to_full(jnp.asarray(got)))
        np.testing.assert_allclose(want, inv, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_sym_outer(n, rng):
    x = rng.standard_normal((4, n))
    got = np.asarray(sym_to_full(F.sym_outer(jnp.asarray(x))))
    want = np.einsum("...i,...j->...ij", x, x)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("k,d", [(1, 1), (2, 2), (3, 3), (3, 2), (5, 4)])
def test_sym_matmul(k, d, rng):
    j = rng.standard_normal((6, k, d))
    h_full, h = random_sym(rng, (6,), k)
    got = np.asarray(sym_to_full(F.sym_matmul(jnp.asarray(j), jnp.asarray(h))))
    want = np.einsum("...ki,...kl,...lj->...ij", j, h_full, j)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_addsubmatvec(rng):
    n = 3
    full, compact = random_sym(rng, (5,), n)
    vec = rng.standard_normal((5, n))
    acc = rng.standard_normal((5, n))
    mv = np.einsum("...ij,...j->...i", full, vec)
    np.testing.assert_allclose(
        np.asarray(F.sym_addmatvec(jnp.asarray(acc), jnp.asarray(compact), jnp.asarray(vec))),
        acc + mv, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(F.sym_submatvec(jnp.asarray(acc), jnp.asarray(compact), jnp.asarray(vec))),
        acc - mv, rtol=1e-12)


def test_broadcasting(rng):
    # mat batch (1, 5), vec batch (7, 1) -> out (7, 5, n)
    n = 3
    full, compact = random_sym(rng, (1, 5), n, spd=True)
    vec = rng.standard_normal((7, 1, n))
    got = np.asarray(F.sym_solve(jnp.asarray(compact), jnp.asarray(vec)))
    assert got.shape == (7, 5, n)
    want = np.linalg.solve(
        np.broadcast_to(full, (7, 5, n, n)),
        np.broadcast_to(vec[..., None], (7, 5, n, 1)),
    )[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_solve_grad(rng):
    # the reference's sym_solve had no autograd; ours must be differentiable
    n = 4
    full, compact = random_sym(rng, (3,), n, spd=True)
    vec = rng.standard_normal((3, n))

    def loss(c, v):
        return jnp.sum(F.sym_solve(c, v) ** 2)

    g_mat, g_vec = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(compact), jnp.asarray(vec)
    )
    # finite-difference check on a few coordinates
    c0 = jnp.asarray(compact)
    v0 = jnp.asarray(vec)
    h = 1e-6
    for idx in [(0, 0), (1, 3), (2, compact.shape[-1] - 1)]:
        e = jnp.zeros_like(c0).at[idx].set(h)
        fd = (loss(c0 + e, v0) - loss(c0 - e, v0)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g_mat[idx]), np.asarray(fd), rtol=1e-4)
    for idx in [(0, 0), (2, n - 1)]:
        e = jnp.zeros_like(v0).at[idx].set(h)
        fd = (loss(c0, v0 + e) - loss(c0, v0 - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g_vec[idx]), np.asarray(fd), rtol=1e-4)
