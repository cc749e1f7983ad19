"""Tests for the Pallas channel-first compact-sym kernels (interpret
mode on CPU; the same kernels compile to Mosaic on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.kernels import sym_matvec_cf, sym_solve_cf, sym_invert_cf
from fastmath_tpu.layouts import full_to_sym, sym_to_full, compact_size


def random_sym_cf(rng, b, n, dtype=np.float64, spd=True):
    full = rng.standard_normal((b, n, n)).astype(dtype)
    if spd:
        full = np.einsum("...ij,...kj->...ik", full, full)
        full = full + n * np.eye(n, dtype=dtype)
    else:
        full = full + np.swapaxes(full, -1, -2) + 3 * n * np.eye(n, dtype=dtype)
    compact = np.asarray(full_to_sym(jnp.asarray(full)))
    return full, np.ascontiguousarray(compact.T)  # (NN, B)


NS = [1, 2, 3, 4, 5, 6, 8]  # 5..8 exercise the in-register PLU tier


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("b", [7, 130, 1000])
def test_solve_cf(n, b, rng):
    full, mat_cf = random_sym_cf(rng, b, n)
    vec = rng.standard_normal((b, n))
    got = np.asarray(sym_solve_cf(jnp.asarray(mat_cf), jnp.asarray(vec.T),
                                  block=256)).T
    want = np.linalg.solve(full, vec[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("n", NS)
def test_matvec_cf(n, rng):
    full, mat_cf = random_sym_cf(rng, 300, n, spd=False)
    vec = rng.standard_normal((300, n))
    got = np.asarray(sym_matvec_cf(jnp.asarray(mat_cf), jnp.asarray(vec.T),
                                   block=256)).T
    want = np.einsum("...ij,...j->...i", full, vec)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("n", NS)
def test_invert_cf(n, rng):
    full, mat_cf = random_sym_cf(rng, 100, n)
    got_cf = np.asarray(sym_invert_cf(jnp.asarray(mat_cf), block=256))
    got = np.asarray(sym_to_full(jnp.asarray(got_cf.T)))
    np.testing.assert_allclose(got, np.linalg.inv(full), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n", [5, 7, 8])
def test_solve_cf_indefinite_pivoting(n, rng):
    """The PLU tier must handle indefinite symmetric matrices (partial
    pivoting), not just SPD — jitfields' solve had no SPD assumption."""
    b = 160
    q, _ = np.linalg.qr(rng.standard_normal((b, n, n)))
    w = rng.uniform(0.5, 3.0, (b, n)) * np.where(
        rng.standard_normal((b, n)) > 0, 1.0, -1.0
    )
    full = np.einsum("...ik,...k,...jk->...ij", q, w, q)
    mat_cf = np.ascontiguousarray(
        np.asarray(full_to_sym(jnp.asarray(full))).T
    )
    vec = rng.standard_normal((b, n))
    got = np.asarray(
        sym_solve_cf(jnp.asarray(mat_cf), jnp.asarray(vec.T), block=256)
    ).T
    want = np.linalg.solve(full, vec[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


def test_solve_cf_refine_plu(rng):
    """refine > 0 on the PLU tier re-solves the residual."""
    full, mat_cf = random_sym_cf(rng, 64, 6)
    vec = rng.standard_normal((64, 6))
    got = np.asarray(
        sym_solve_cf(jnp.asarray(mat_cf), jnp.asarray(vec.T), block=256,
                     refine=1)
    ).T
    want = np.linalg.solve(full, vec[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-11)


def test_solve_cf_refine_rolled(rng):
    """refine > 0 on the rolled 9<=n<=16 tier: factor-once against
    [v | I], refinement corrections via the explicit inverse (the
    round-3 review found the old path refactoring per step)."""
    full, mat_cf = random_sym_cf(rng, 24, 12)
    vec = rng.standard_normal((24, 12))
    want = np.linalg.solve(full, vec[..., None])[..., 0]
    for refine in (1, 2):
        got = np.asarray(
            sym_solve_cf(jnp.asarray(mat_cf), jnp.asarray(vec.T),
                         block=128, refine=refine)
        ).T
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-11)


def test_solve_grad_plu(rng):
    """Solve VJP on the N=6 PLU tier vs finite differences."""
    full, mat_cf = random_sym_cf(rng, 5, 6)
    vec = rng.standard_normal((5, 6))
    mat_j = jnp.asarray(mat_cf)
    vec_j = jnp.asarray(vec.T)
    co = jnp.asarray(rng.standard_normal(vec.T.shape))

    def loss(m, v):
        return jnp.sum(co * sym_solve_cf(m, v, block=256))

    gm, gv = jax.grad(loss, argnums=(0, 1))(mat_j, vec_j)
    h = 1e-6
    for idx in [(0, 1), (7, 3), (20, 4)]:
        e = jnp.zeros_like(mat_j).at[idx].set(h)
        fd = (loss(mat_j + e, vec_j) - loss(mat_j - e, vec_j)) / (2 * h)
        np.testing.assert_allclose(np.asarray(gm[idx]), np.asarray(fd),
                                   rtol=1e-4, atol=1e-7)
    for idx in [(0, 0), (5, 2)]:
        e = jnp.zeros_like(vec_j).at[idx].set(h)
        fd = (loss(mat_j, vec_j + e) - loss(mat_j, vec_j - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(gv[idx]), np.asarray(fd),
                                   rtol=1e-4, atol=1e-7)


def test_solve_eps(rng):
    n = 3
    full, mat_cf = random_sym_cf(rng, 50, n)
    vec = rng.standard_normal((50, n))
    got = np.asarray(sym_solve_cf(jnp.asarray(mat_cf), jnp.asarray(vec.T),
                                  eps=[0.5, 1.0], block=256)).T
    want = np.linalg.solve(full + np.diag([0.5, 1.0, 1.0]), vec[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_solve_matches_xla_path(rng):
    from fastmath_tpu.ops import sym as F

    n = 4
    full, mat_cf = random_sym_cf(rng, 123, n)
    vec = rng.standard_normal((123, n))
    pallas = np.asarray(sym_solve_cf(jnp.asarray(mat_cf), jnp.asarray(vec.T),
                                     block=128)).T
    xla = np.asarray(F.sym_solve(jnp.asarray(mat_cf.T), jnp.asarray(vec)))
    np.testing.assert_allclose(pallas, xla, rtol=1e-12, atol=1e-13)


def test_solve_grad(rng):
    n = 3
    full, mat_cf = random_sym_cf(rng, 20, n)
    vec = jnp.asarray(rng.standard_normal((n, 20)))
    mat = jnp.asarray(mat_cf)

    def loss(m, v):
        return jnp.sum(sym_solve_cf(m, v, block=128) ** 2)

    gm, gv = jax.grad(loss, argnums=(0, 1))(mat, vec)
    h = 1e-6
    for idx in [(0, 0), (4, 7), (5, 19)]:
        e = jnp.zeros_like(mat).at[idx].set(h)
        fd = (loss(mat + e, vec) - loss(mat - e, vec)) / (2 * h)
        np.testing.assert_allclose(np.asarray(gm[idx]), np.asarray(fd), rtol=1e-4)
    for idx in [(0, 0), (2, 13)]:
        e = jnp.zeros_like(vec).at[idx].set(h)
        fd = (loss(mat, vec + e) - loss(mat, vec - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(gv[idx]), np.asarray(fd), rtol=1e-4)


def test_invert_grad(rng):
    n = 3
    full, mat_cf = random_sym_cf(rng, 10, n)
    mat = jnp.asarray(mat_cf)
    w = jnp.asarray(rng.standard_normal(mat.shape))

    def loss(m):
        return jnp.sum(sym_invert_cf(m, block=128) * w)

    g = jax.grad(loss)(mat)
    h = 1e-6
    for idx in [(0, 0), (3, 5), (5, 9)]:
        e = jnp.zeros_like(mat).at[idx].set(h)
        fd = (loss(mat + e) - loss(mat - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd), rtol=1e-4)


def test_matvec_grad(rng):
    n = 2
    full, mat_cf = random_sym_cf(rng, 15, n, spd=False)
    mat = jnp.asarray(mat_cf)
    vec = jnp.asarray(rng.standard_normal((n, 15)))

    def loss(m, v):
        return jnp.sum(sym_matvec_cf(m, v, block=128) ** 3)

    gm, gv = jax.grad(loss, argnums=(0, 1))(mat, vec)
    h = 1e-6
    e = jnp.zeros_like(mat).at[(2, 3)].set(h)
    fd = (loss(mat + e, vec) - loss(mat - e, vec)) / (2 * h)
    np.testing.assert_allclose(np.asarray(gm[2, 3]), np.asarray(fd), rtol=1e-4)
    e = jnp.zeros_like(vec).at[(1, 4)].set(h)
    fd = (loss(mat, vec + e) - loss(mat, vec - e)) / (2 * h)
    np.testing.assert_allclose(np.asarray(gv[1, 4]), np.asarray(fd), rtol=1e-4)


def test_layout_error():
    with pytest.raises(ValueError):
        sym_solve_cf(jnp.zeros((7, 10)), jnp.zeros((4, 10)))


def test_solve_eps_smoothing(rng):
    """eps= diagonal smoothing in the kernel (reference
    _impl/sym.py:377-382 contract): singular matrices become solvable."""
    import jax.numpy as jnp
    from fastmath_tpu.kernels import sym_solve_cf
    from fastmath_tpu.layouts import full_to_sym, sym_to_full

    n, b = 3, 140
    # rank-deficient: outer product of a single vector
    u = rng.standard_normal((b, n))
    full = np.einsum("...i,...j->...ij", u, u)
    cf = np.ascontiguousarray(np.asarray(full_to_sym(jnp.asarray(full))).T)
    v = rng.standard_normal((b, n))
    eps = 1e-2
    x = np.asarray(sym_solve_cf(jnp.asarray(cf), jnp.asarray(v.T.copy()),
                                eps=eps, block=128, refine=0)).T
    want = np.linalg.solve(full + eps * np.eye(n), v[..., None])[..., 0]
    np.testing.assert_allclose(x, want, rtol=1e-8, atol=1e-10)
    assert np.isfinite(x).all()


def test_broadcast_matvec_scalar_mat(rng):
    """A single compact matrix broadcast over a lane batch."""
    import jax.numpy as jnp
    from fastmath_tpu.kernels import sym_matvec_cf
    from fastmath_tpu.layouts import full_to_sym

    n, b = 4, 300
    a = rng.standard_normal((n, n)); full = a + a.T
    cf = np.asarray(full_to_sym(jnp.asarray(full)))
    v = rng.standard_normal((b, n))
    got = np.asarray(sym_matvec_cf(jnp.asarray(cf)[:, None],
                                   jnp.asarray(v.T.copy()), block=128)).T
    np.testing.assert_allclose(got, v @ full.T, rtol=1e-12)


# --- fused-iteration chain solve (sym_solve_chain / sym_solve_chain_cf) ----


def _chain_oracle(full, vec, iters, add=None):
    x = vec.copy()
    for _ in range(iters):
        x = np.linalg.solve(full, x[..., None])[..., 0]
        if add is not None:
            x = x + add
    return x


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("iters", [1, 4])
def test_solve_chain_cf(n, iters, rng):
    full, mat_cf = random_sym_cf(rng, 300, n)
    vec = rng.standard_normal((300, n))
    add = rng.standard_normal((300, n))
    from fastmath_tpu.kernels import sym_solve_chain_cf

    got = np.asarray(
        sym_solve_chain_cf(jnp.asarray(mat_cf), jnp.asarray(vec.T),
                           iters=iters, add=jnp.asarray(add.T.copy()),
                           block=256)).T
    np.testing.assert_allclose(got, _chain_oracle(full, vec, iters, add),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n", [2, 6])
def test_solve_chain_cf_no_add_bm(n, rng):
    full, mat_cf = random_sym_cf(rng, 200, n)
    vec = rng.standard_normal((200, n))
    from fastmath_tpu.kernels import sym_solve_chain_cf

    got = np.asarray(
        sym_solve_chain_cf(jnp.asarray(mat_cf), jnp.asarray(vec.T),
                           iters=3, block=128, bm=True)).T
    np.testing.assert_allclose(got, _chain_oracle(full, vec, 3),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n", [3, 8])
def test_solve_chain_public_backends_agree(n, rng):
    from fastmath_tpu.ops.sym import sym_solve_chain

    full, mat_cf = random_sym_cf(rng, 150, n)
    compact = jnp.asarray(np.ascontiguousarray(mat_cf.T))
    vec = rng.standard_normal((150, n))
    add = rng.standard_normal((n,))  # broadcast add
    want = _chain_oracle(full, vec, 3, np.broadcast_to(add, (150, n)))
    for backend in ("xla", "pallas", "auto"):
        got = np.asarray(sym_solve_chain(compact, jnp.asarray(vec), 3,
                                         add=jnp.asarray(add),
                                         backend=backend))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    # iters=0 is the identity on vec
    np.testing.assert_allclose(
        np.asarray(sym_solve_chain(compact, jnp.asarray(vec), 0)), vec)


def test_solve_chain_grad_matches_scan(rng):
    """The kernel VJP (scan replay) must equal AD through the XLA scan."""
    from fastmath_tpu.ops.sym import sym_solve_chain

    n, b = 3, 64
    full, mat_cf = random_sym_cf(rng, b, n)
    c = jnp.asarray(np.ascontiguousarray(mat_cf.T))
    v = jnp.asarray(rng.standard_normal((b, n)))
    ad = jnp.asarray(rng.standard_normal((b, n)))

    def loss(backend):
        return lambda c, v, ad: jnp.sum(
            jnp.sin(sym_solve_chain(c, v, 3, add=ad, backend=backend)))

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(c, v, ad)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(c, v, ad)
    for a_, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-9, atol=1e-11)


def test_solve_chain_eps_and_f32(rng):
    from fastmath_tpu.ops.sym import sym_solve_chain

    n, b = 4, 256
    full, mat_cf = random_sym_cf(rng, b, n)
    c32 = jnp.asarray(np.ascontiguousarray(mat_cf.T), jnp.float32)
    v32 = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    eps = 0.25
    want = _chain_oracle(full + eps * np.eye(n),
                         np.asarray(v32, np.float64), 2)
    got = np.asarray(sym_solve_chain(c32, v32, 2, eps=eps,
                                     backend="pallas"), np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("n", [12, 16])
def test_solve_chain_rolled_tier(n, rng):
    """Chain at 9 <= N <= 16: rolled-PLU inverse applied per iteration
    (same algebra as the N <= 4 adjugate/det application)."""
    from fastmath_tpu.ops.sym import sym_solve_chain

    b = 256
    a = rng.standard_normal((b, n, n))
    spd = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n)
    c = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd))))
    v = jnp.asarray(rng.standard_normal((b, n)))
    ad = jnp.asarray(rng.standard_normal((b, n)))
    ref = np.asarray(v)
    for _ in range(3):
        ref = np.linalg.solve(spd, ref[..., None])[..., 0] + np.asarray(ad)
    for backend in ("pallas", "xla"):
        got = np.asarray(sym_solve_chain(c, v, 3, add=ad, backend=backend))
        np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-8)
