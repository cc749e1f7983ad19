"""Tests for batched QR machinery and Jacobi eig_sym vs numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.ops import qr as Q


def randsym(rng, b, n):
    a = rng.standard_normal((b, n, n))
    return a + np.swapaxes(a, -1, -2)


@pytest.mark.parametrize("n", [2, 3, 4, 8, 16])
def test_eig_sym_values(n, rng):
    a = randsym(rng, 20, n)
    w = np.sort(np.asarray(Q.eig_sym(jnp.asarray(a))), axis=-1)
    want = np.sort(np.linalg.eigvalsh(a), axis=-1)
    np.testing.assert_allclose(w, want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n", [2, 5, 8])
def test_eig_sym_vectors(n, rng):
    a = randsym(rng, 10, n)
    w, u = Q.eig_sym(jnp.asarray(a), compute_u=True)
    w, u = np.asarray(w), np.asarray(u)
    # A u_i = w_i u_i
    recon = np.einsum("...ij,...j,...kj->...ik", u, w, u)
    np.testing.assert_allclose(recon, a, rtol=1e-8, atol=1e-8)
    # orthonormality
    gram = np.einsum("...ji,...jk->...ik", u, u)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(n), gram.shape),
                               atol=1e-9)


@pytest.mark.parametrize("n", [2, 4, 6])
def test_eig_sym_complex_hermitian(n, rng):
    h = rng.standard_normal((6, n, n)) + 1j * rng.standard_normal((6, n, n))
    h = h + np.conj(np.swapaxes(h, -1, -2))
    w, u = Q.eig_sym(jnp.asarray(h), compute_u=True)
    w, u = np.asarray(w), np.asarray(u)
    assert not np.iscomplexobj(w)  # eigenvalues of a Hermitian are real
    np.testing.assert_allclose(np.sort(w, -1), np.sort(np.linalg.eigvalsh(h), -1),
                               rtol=1e-8, atol=1e-8)
    recon = np.einsum("...ij,...j,...kj->...ik", u, w, np.conj(u))
    np.testing.assert_allclose(recon, h, rtol=1e-8, atol=1e-8)
    gram = np.einsum("...ji,...jk->...ik", np.conj(u), u)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(n), gram.shape),
                               atol=1e-9)


def test_eig_sym_upper_lower(rng):
    a = randsym(rng, 5, 4)
    junk_lower = a.copy()
    junk_lower[..., np.tril_indices(4, -1)[0], np.tril_indices(4, -1)[1]] = 99.0
    w1 = np.sort(np.asarray(Q.eig_sym(jnp.asarray(junk_lower), upper=True)), -1)
    want = np.sort(np.linalg.eigvalsh(a), -1)
    np.testing.assert_allclose(w1, want, rtol=1e-9, atol=1e-9)
    junk_upper = a.copy()
    junk_upper[..., np.triu_indices(4, 1)[0], np.triu_indices(4, 1)[1]] = -7.0
    w2 = np.sort(np.asarray(Q.eig_sym(jnp.asarray(junk_upper), upper=False)), -1)
    np.testing.assert_allclose(w2, want, rtol=1e-9, atol=1e-9)


def test_eig_sym_grad(rng):
    a = randsym(rng, 3, 4)
    aj = jnp.asarray(a)

    def loss(m):
        w = Q.eig_sym(m, check_finite=False)
        return jnp.sum(w**3)

    g = jax.grad(loss)(aj)
    h = 1e-6
    for idx in [(0, 0, 0), (1, 1, 2), (2, 3, 3)]:
        e = jnp.zeros_like(aj).at[idx].set(h)
        # symmetrize the perturbation like the function does internally
        fd = (loss(aj + e) - loss(aj - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd),
                                   rtol=1e-4, atol=1e-8)


def test_eig_sym_vector_grad(rng):
    a = randsym(rng, 2, 3)
    aj = jnp.asarray(a)
    wmat = jnp.asarray(rng.standard_normal((2, 3, 3)))

    def loss(m):
        w, u = Q.eig_sym(m, compute_u=True, check_finite=False)
        # gauge-invariant functional of eigenvectors
        p = jnp.einsum("...ij,...j,...kj->...ik", u, jnp.exp(w), u)
        return jnp.sum(p * wmat)

    g = jax.grad(loss)(aj)
    h = 1e-6
    for idx in [(0, 0, 1), (1, 2, 2)]:
        e = jnp.zeros_like(aj).at[idx].set(h)
        fd = (loss(aj + e) - loss(aj - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd),
                                   rtol=1e-4, atol=1e-8)


def test_check_finite():
    bad = jnp.asarray([[jnp.inf, 0.0], [0.0, 1.0]])
    with pytest.raises(ValueError):
        Q.eig_sym(bad)
    with pytest.raises(ValueError):
        Q.hessenberg(jnp.full((3, 4), jnp.nan))


def test_householder(rng):
    x = rng.standard_normal((6, 5))
    u, alpha = Q.householder(jnp.asarray(x), return_alpha=True)
    u, alpha = np.asarray(u), np.asarray(alpha)
    for b in range(6):
        P = np.eye(5) - 2 * np.outer(u[b], u[b])
        px = P @ x[b]
        np.testing.assert_allclose(px[0], alpha[b], rtol=1e-10)
        np.testing.assert_allclose(px[1:], 0, atol=1e-10)
        np.testing.assert_allclose(abs(alpha[b]), np.linalg.norm(x[b]), rtol=1e-12)


def test_householder_apply(rng):
    a = rng.standard_normal((4, 4))
    x = rng.standard_normal(4)
    u = Q.householder(jnp.asarray(x))
    P = np.eye(4) - 2 * np.outer(np.asarray(u), np.asarray(u))
    got = np.asarray(Q.householder_apply(jnp.asarray(a), u, side="both"))
    np.testing.assert_allclose(got, P @ a @ P, rtol=1e-10, atol=1e-12)
    got = np.asarray(Q.householder_apply(jnp.asarray(a), u, side="left"))
    np.testing.assert_allclose(got, P @ a, rtol=1e-10, atol=1e-12)


def test_householder_apply_k(rng):
    """`k` parity with the reference (``_impl/qr.py:86-88``): the
    length of ``ensure_list(k)`` selects how many leading reflectors
    are applied — an int applies exactly one, a list of length m the
    first m, None all of them."""
    n = 5
    a = rng.standard_normal((n, n))
    us = [Q.householder(jnp.asarray(rng.standard_normal(n)))
          for _ in range(3)]
    Ps = [np.eye(n) - 2 * np.outer(np.asarray(u), np.asarray(u))
          for u in us]

    def ref_apply(num):
        out = a.copy()
        for P in Ps[:num]:
            out = P @ out @ P
        return out

    got_all = np.asarray(Q.householder_apply(jnp.asarray(a), us))
    np.testing.assert_allclose(got_all, ref_apply(3), rtol=1e-10,
                               atol=1e-12)
    got_int = np.asarray(Q.householder_apply(jnp.asarray(a), us, k=2))
    np.testing.assert_allclose(got_int, ref_apply(1), rtol=1e-10,
                               atol=1e-12)
    got_list = np.asarray(
        Q.householder_apply(jnp.asarray(a), us, k=[0, 1])
    )
    np.testing.assert_allclose(got_list, ref_apply(2), rtol=1e-10,
                               atol=1e-12)
    got_range = np.asarray(
        Q.householder_apply(jnp.asarray(a), us, k=range(2))
    )
    np.testing.assert_allclose(got_range, ref_apply(2), rtol=1e-10,
                               atol=1e-12)
    # inverse reverses the list BEFORE the k-truncation (reference
    # ``_impl/qr.py:76-88``): inverse + k=[0] applies only the LAST
    # reflector
    got_inv = np.asarray(
        Q.householder_apply(jnp.asarray(a), us, k=[0], inverse=True)
    )
    np.testing.assert_allclose(got_inv, Ps[2] @ a @ Ps[2], rtol=1e-10,
                               atol=1e-12)
    # inverse without k applies all reflectors in reverse order
    got_inv_all = np.asarray(
        Q.householder_apply(jnp.asarray(a), us, inverse=True)
    )
    want = a.copy()
    for P in Ps[::-1]:
        want = P @ want @ P
    np.testing.assert_allclose(got_inv_all, want, rtol=1e-10, atol=1e-12)


def test_householder_apply_short_reflectors(rng):
    """Reflectors shorter than n act on the trailing rows/columns (the
    reference's ``k0 = n - len(u)`` offset, ``_impl/qr.py:95-103``)."""
    n = 5
    a = rng.standard_normal((n, n))
    x = rng.standard_normal(3)
    u3 = np.asarray(Q.householder(jnp.asarray(x)))
    u_full = np.concatenate([np.zeros(2), u3])
    P = np.eye(n) - 2 * np.outer(u_full, u_full)
    got = np.asarray(
        Q.householder_apply(jnp.asarray(a), jnp.asarray(u3), side="both")
    )
    np.testing.assert_allclose(got, P @ a @ P, rtol=1e-10, atol=1e-12)


def test_eig_sym_f32_converges(rng):
    """f32 eig must exit on the Frobenius-relative test (an absolute
    1e-32 threshold can never fire in f32) and still be accurate."""
    a = rng.standard_normal((50, 5, 5)).astype(np.float32)
    a = a + np.swapaxes(a, -1, -2)
    w = np.sort(np.asarray(Q.eig_sym(jnp.asarray(a))), -1)
    want = np.sort(np.linalg.eigvalsh(a), -1)
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-4)


# --- rounds-rolled parallel-order XLA sweep (n >= _XLA_ROLLED_MIN_N) -------
# The trace-unrolled cyclic sweep's n(n-1)/2 stanzas cost a 4-minute
# CPU compile at n=28 (measured round 4); large n uses a fori_loop over
# static round-robin rounds instead. Same mathematics, different
# rotation order — these tests pin parity at and past the boundary.


def test_round_robin_schedule():
    from fastmath_tpu.ops.qr import _round_robin_partners

    for n in (17, 18, 27, 28, 32):
        part = _round_robin_partners(n)
        seen = set()
        for r in range(part.shape[0]):
            p = part[r]
            # involutive permutation: partner-of-partner is self
            assert (p[p] == np.arange(n)).all()
            for i in range(n):
                if p[i] != i:
                    seen.add((min(i, int(p[i])), max(i, int(p[i]))))
        # every unordered pair rotated exactly once per sweep
        assert len(seen) == n * (n - 1) // 2


@pytest.mark.parametrize("n", [17, 20, 27])
def test_eig_sym_rolled_xla_values_vectors(n, rng):
    from fastmath_tpu.ops.qr import _XLA_ROLLED_MIN_N

    assert n >= _XLA_ROLLED_MIN_N
    a = randsym(rng, 8, n)
    w, u = Q.eig_sym(jnp.asarray(a), compute_u=True, backend="xla")
    w, u = np.asarray(w), np.asarray(u)
    want = np.sort(np.linalg.eigvalsh(a), -1)
    np.testing.assert_allclose(np.sort(w, -1), want, rtol=1e-9, atol=1e-9)
    recon = np.einsum("...ij,...j,...kj->...ik", u, w, u)
    np.testing.assert_allclose(recon, a, rtol=1e-8, atol=1e-8)
    gram = np.einsum("...ji,...jk->...ik", u, u)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(n), gram.shape),
                               atol=1e-9)


def test_eig_sym_rolled_xla_hermitian(rng):
    n = 18
    h = rng.standard_normal((4, n, n)) + 1j * rng.standard_normal((4, n, n))
    h = h + np.conj(np.swapaxes(h, -1, -2))
    w, u = Q.eig_sym(jnp.asarray(h), compute_u=True, backend="xla")
    w, u = np.asarray(w), np.asarray(u)
    assert not np.iscomplexobj(w)
    np.testing.assert_allclose(
        np.sort(w, -1), np.sort(np.linalg.eigvalsh(h), -1),
        rtol=1e-8, atol=1e-8)
    recon = np.einsum("...ij,...j,...kj->...ik", u, w, np.conj(u))
    np.testing.assert_allclose(recon, h, rtol=1e-8, atol=1e-8)


def test_eig_sym_rolled_xla_f32(rng):
    """f32 at n=28: eigenvalues stay ~1e-5-class; the reconstruction
    carries the measured f32 Jacobi drift floor (worst lanes ~2e-4 —
    the logm sym route corrects it with Daleckii-Krein, ops/lie.py)."""
    n = 28
    a = randsym(rng, 12, n).astype(np.float32)
    w, u = Q.eig_sym(jnp.asarray(a), compute_u=True, backend="xla")
    w, u = np.asarray(w, np.float64), np.asarray(u, np.float64)
    want = np.sort(np.linalg.eigvalsh(a.astype(np.float64)), -1)
    scale = np.abs(want).max(-1, keepdims=True)
    assert (np.abs(np.sort(w, -1) - want) / scale).max() < 2e-5
    recon = np.einsum("...ij,...j,...kj->...ik", u, w, u)
    nw = (np.linalg.norm((recon - a).reshape(len(a), -1), axis=-1)
          / np.linalg.norm(a.reshape(len(a), -1), axis=-1))
    assert nw.max() < 1e-3, nw.max()


def test_eig_sym_rolled_xla_grad(rng):
    """Giles VJP composes with the rolled forward at n >= 17."""
    n = 18
    a = randsym(rng, 2, n)
    aj = jnp.asarray(a)

    def loss(x):
        w = Q.eig_sym(0.5 * (x + jnp.swapaxes(x, -1, -2)), backend="xla")
        return jnp.sum(jnp.sort(w, -1)[..., -1])  # largest eigenvalue

    g = np.asarray(jax.grad(loss)(aj))
    # oracle: d lambda_max / dA = u u^T (symmetrized)
    ww, uu = np.linalg.eigh(a)
    u1 = uu[..., :, -1]
    want = 0.5 * (np.einsum("...i,...j->...ij", u1, u1)
                  + np.einsum("...j,...i->...ij", u1, u1))
    np.testing.assert_allclose(g, want, rtol=1e-7, atol=1e-9)


def test_eig_sym_nan_lane_isolation(rng):
    """A NaN matrix in the batch must not freeze or early-exit the
    sweep loop for the others."""
    a = rng.standard_normal((4, 4, 4))
    a = a + np.swapaxes(a, -1, -2)
    a[1] = np.nan
    w = np.asarray(Q.eig_sym(jnp.asarray(a), check_finite=False))
    want = np.linalg.eigvalsh(a[[0, 2, 3]])
    np.testing.assert_allclose(
        np.sort(w[[0, 2, 3]], -1), want, rtol=1e-9, atol=1e-9
    )
    assert np.isnan(w[1]).all()


@pytest.mark.parametrize("n", [3, 5, 8])
def test_hessenberg(n, rng):
    a = rng.standard_normal((4, n, n))
    h, us = Q.hessenberg(jnp.asarray(a), compute_u=True)
    h = np.asarray(h)
    # Hessenberg structure
    for i in range(n):
        for j in range(n):
            if i > j + 1:
                np.testing.assert_allclose(h[..., i, j], 0, atol=1e-10)
    # similarity: same eigenvalues
    np.testing.assert_allclose(
        np.sort_complex(np.linalg.eigvals(h)),
        np.sort_complex(np.linalg.eigvals(a)), rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("upper", [True, False])
def test_hessenberg_sym(upper, rng):
    a = randsym(rng, 3, 6)
    h = np.asarray(Q.hessenberg_sym(jnp.asarray(a), upper=upper))
    # tridiagonal
    for i in range(6):
        for j in range(6):
            if abs(i - j) > 1:
                np.testing.assert_allclose(h[..., i, j], 0, atol=1e-9)
    np.testing.assert_allclose(np.sort(np.linalg.eigvalsh(h), -1),
                               np.sort(np.linalg.eigvalsh(a), -1),
                               rtol=1e-8, atol=1e-9)


def test_givens():
    c, s = Q.givens(jnp.asarray(3.0), jnp.asarray(4.0))
    # G @ [x, y] = [r, 0] with G = [[c, -s], [s, c]]
    G = np.array([[float(c), -float(s)], [float(s), float(c)]])
    np.testing.assert_allclose(G @ [3.0, 4.0], [5.0, 0.0], atol=1e-12)
    c, s = Q.givens(jnp.asarray(0.0), jnp.asarray(0.0))
    assert float(c) == 1.0 and float(s) == 0.0


def test_givens_apply(rng):
    a = rng.standard_normal((4, 4))
    c, s = Q.givens(jnp.asarray(a[1, 0]), jnp.asarray(a[2, 0]))
    got = np.asarray(Q.givens_apply(jnp.asarray(a), c, s, i=1, j=2, side="left"))
    G = np.eye(4)
    G[1, 1], G[1, 2], G[2, 1], G[2, 2] = float(c), -float(s), float(s), float(c)
    np.testing.assert_allclose(got, G @ a, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n", [3, 6])
def test_qr_hessenberg(n, rng):
    a = rng.standard_normal((5, n, n))
    h = np.asarray(Q.hessenberg(jnp.asarray(a)))
    q, r = Q.qr_hessenberg(jnp.asarray(h))
    q, r = np.asarray(q), np.asarray(r)
    np.testing.assert_allclose(q @ r, h, rtol=1e-9, atol=1e-9)
    # q orthogonal, r upper triangular
    np.testing.assert_allclose(np.einsum("...ji,...jk->...ik", q, q),
                               np.broadcast_to(np.eye(n), q.shape), atol=1e-10)
    for i in range(n):
        for j in range(i):
            np.testing.assert_allclose(r[..., i, j], 0, atol=1e-10)


def test_rq_hessenberg(rng):
    n = 5
    a = rng.standard_normal((3, n, n))
    h = np.asarray(Q.hessenberg(jnp.asarray(a)))
    q, r = Q.qr_hessenberg(jnp.asarray(h))
    rq = np.asarray(Q.rq_hessenberg(jnp.asarray(h)))
    np.testing.assert_allclose(rq, np.asarray(r) @ np.asarray(q),
                               rtol=1e-9, atol=1e-9)


# --- eig_sym polish (round 5, VERDICT r4 next #4) ---------------------------


def _eig_quality(sym, w, u):
    """(orthogonality defect, off(U^T A U)/fro) per lane, in f64."""
    w = np.asarray(w, np.float64)
    u = np.asarray(u, np.float64)
    n = u.shape[-1]
    fro = np.linalg.norm(sym.reshape(sym.shape[0], -1), axis=-1)
    orth = np.abs(
        np.einsum("bij,bik->bjk", u, u) - np.eye(n)).max(axis=(-2, -1))
    R = np.einsum("bji,bjk,bkl->bil", u, sym.astype(np.float64), u)
    off = np.abs(R - w[:, :, None] * np.eye(n)).max(axis=(-2, -1)) / fro
    return orth, off


@pytest.mark.parametrize("n", [12, 20])
def test_eig_sym_polish_f32(n, rng):
    """polish (auto-on for f32 iterative paths) takes the f32 Jacobi
    floor — U orthogonality drift ~1e-5, off(U^T A U) stall at
    ~1e-5..1e-4 * fro — to the ~1e-7 class, and Rayleigh-quotient
    eigenvalues beat the iterated-matrix diagonal ~8x (measured)."""
    b = 64
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    sym = 0.5 * (a + np.swapaxes(a, -1, -2))
    w0, u0 = Q.eig_sym(jnp.asarray(sym), compute_u=True, backend="xla",
                       polish=False)
    w1, u1 = Q.eig_sym(jnp.asarray(sym), compute_u=True, backend="xla")
    orth0, off0 = _eig_quality(sym, w0, u0)
    orth1, off1 = _eig_quality(sym, w1, u1)
    assert orth1.max() < 1e-6, orth1.max()
    assert off1.max() < 1e-6, off1.max()
    assert orth1.max() < orth0.max() and off1.max() < off0.max() * 0.5
    wref = np.linalg.eigvalsh(sym.astype(np.float64))
    fro = np.linalg.norm(sym.reshape(b, -1), axis=-1)[:, None]
    e0 = (np.abs(np.sort(np.asarray(w0, np.float64), -1) - wref)
          / fro).max()
    e1 = (np.abs(np.sort(np.asarray(w1, np.float64), -1) - wref)
          / fro).max()
    assert e1 < 5e-7 and e1 < e0, (e0, e1)


def test_eig_sym_polish_near_degenerate(rng):
    """Tikhonov damping: clustered eigenvalues must not blow up the
    first-order correction (the raw divided difference would divide by
    ~0); polished quality still beats unpolished."""
    n, b = 10, 16
    w = np.linspace(1.0, 2.0, n)
    w[3] = w[2] + 1e-6  # near-degenerate pair, gap << theta
    a = rng.standard_normal((b, n, n))
    q, _ = np.linalg.qr(a)
    sym = np.einsum("bik,k,bjk->bij", q, w, q).astype(np.float32)
    sym = 0.5 * (sym + np.swapaxes(sym, -1, -2))
    w1, u1 = Q.eig_sym(jnp.asarray(sym), compute_u=True, backend="xla")
    assert np.isfinite(np.asarray(w1)).all()
    assert np.isfinite(np.asarray(u1)).all()
    orth1, off1 = _eig_quality(sym, w1, u1)
    assert orth1.max() < 1e-6
    # within-cluster off-diagonal is bounded by the damped term, not
    # amplified: still well under the unpolished f32 floor
    assert off1.max() < 5e-6


def test_eig_sym_polish_hermitian(rng):
    n, b = 8, 24
    ar = rng.standard_normal((b, n, n)).astype(np.float32)
    ai = rng.standard_normal((b, n, n)).astype(np.float32)
    h = (ar + 1j * ai).astype(np.complex64)
    h = 0.5 * (h + np.conj(np.swapaxes(h, -1, -2)))
    w1, u1 = Q.eig_sym(jnp.asarray(h), compute_u=True)
    u = np.asarray(u1, np.complex128)
    orth = np.abs(np.einsum("bij,bik->bjk", u.conj(), u)
                  - np.eye(n)).max()
    assert orth < 1e-6, orth
    R = np.einsum("bji,bjk,bkl->bil", u.conj(), h.astype(np.complex128), u)
    fro = np.linalg.norm(h.reshape(b, -1), axis=-1)[:, None, None]
    off = np.abs(R - np.asarray(w1, np.float64)[:, :, None] * np.eye(n))
    assert (off / fro).max() < 1e-6


def test_eig_sym_polish_f64_and_grad(rng):
    """Forced polish on f64 must stay at machine-precision quality
    (auto leaves it off there), and the polish composes with the Giles
    VJP through ordinary AD."""
    n, b = 6, 8
    a = rng.standard_normal((b, n, n))
    sym = 0.5 * (a + np.swapaxes(a, -1, -2))
    w1, u1 = Q.eig_sym(jnp.asarray(sym), compute_u=True, backend="xla",
                       polish=True)
    orth1, off1 = _eig_quality(sym, w1, u1)
    assert orth1.max() < 1e-13 and off1.max() < 1e-12

    co = jnp.asarray(rng.standard_normal((b, n)))

    def loss(x, polish):
        w = Q.eig_sym(x, compute_u=True, backend="xla", polish=polish)[0]
        return jnp.sum(co * w)

    gp = jax.grad(lambda x: loss(x, True))(jnp.asarray(sym))
    g0 = jax.grad(lambda x: loss(x, False))(jnp.asarray(sym))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(g0),
                               rtol=1e-7, atol=1e-9)
