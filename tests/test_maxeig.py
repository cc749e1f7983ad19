"""sym_maxeig — fused batched power iteration (dominant eigenpair).

Oracle: numpy ``eigvalsh`` dominant-|λ| eigenvalue on gap-engineered
symmetric matrices (a rank-1 boost guarantees λ2/λ1 is small enough
that ``iters`` steps converge to oracle precision)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.kernels.sym_pallas import sym_maxeig_cf
from fastmath_tpu.layouts import full_to_sym
from fastmath_tpu.ops.sym import sym_maxeig


def gapped_sym(rng, b, n, sign=1.0):
    """Random symmetric batch with a dominant (sign * ~8)-eigenvalue."""
    a = rng.standard_normal((b, n, n))
    A = (a + a.swapaxes(-1, -2)) / 2
    u = rng.standard_normal((b, n))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    A = A + sign * 8.0 * n * u[..., :, None] * u[..., None, :]
    w = np.linalg.eigvalsh(A)
    dom = w[np.arange(b), np.argmax(np.abs(w), axis=-1)]
    compact = np.asarray(full_to_sym(jnp.asarray(A)))
    return A, compact, dom


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6, 8, 12, 16])
def test_public_parity(n, rng):
    A, compact, dom = gapped_sym(rng, 200, n)
    mu, v = sym_maxeig(jnp.asarray(compact), iters=120, return_vector=True)
    mu, v = np.asarray(mu), np.asarray(v)
    np.testing.assert_allclose(mu, dom, rtol=1e-10)
    # eigenpair residual: A v = mu v, v unit
    res = np.linalg.norm(
        np.einsum("bij,bj->bi", A, v) - mu[:, None] * v, axis=-1)
    assert res.max() < 1e-8 * np.abs(dom).max()
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, rtol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 4, 6, 8, 12, 16])
def test_kernel_parity(n, rng):
    _, compact, dom = gapped_sym(rng, 300, n)
    v0 = rng.standard_normal((n, 1))
    out = sym_maxeig_cf(jnp.asarray(compact.T.copy()), jnp.asarray(v0),
                        iters=120, block=128)
    np.testing.assert_allclose(np.asarray(out[0]), dom, rtol=1e-10)


def test_negative_dominant(rng):
    _, compact, dom = gapped_sym(rng, 100, 4, sign=-1.0)
    assert (dom < 0).all()
    mu = sym_maxeig(jnp.asarray(compact), iters=120)
    np.testing.assert_allclose(np.asarray(mu), dom, rtol=1e-10)


def test_backend_equivalence(rng):
    _, compact, dom = gapped_sym(rng, 150, 6)
    m = jnp.asarray(compact)
    mu_x = sym_maxeig(m, iters=60, backend="xla")
    mu_p = sym_maxeig(m, iters=60, backend="pallas")
    np.testing.assert_allclose(np.asarray(mu_x), np.asarray(mu_p),
                               rtol=1e-12, atol=1e-12)


def test_broadcast_batch_dims(rng):
    _, compact, dom = gapped_sym(rng, 6, 3)
    m = jnp.asarray(compact.reshape(2, 3, 6))
    mu = sym_maxeig(m, iters=120)
    assert mu.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(mu).ravel(), dom, rtol=1e-10)


def test_warm_start_and_iters0(rng):
    A, compact, dom = gapped_sym(rng, 50, 4)
    m = jnp.asarray(compact)
    # converged vector as v0: a single extra iteration stays put
    mu, v = sym_maxeig(m, iters=120, return_vector=True)
    mu2 = sym_maxeig(m, iters=1, v0=v)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu), rtol=1e-10)
    # iters=0: Rayleigh quotient of the (normalized) v0 itself
    mu0 = sym_maxeig(m, iters=0, v0=v)
    np.testing.assert_allclose(np.asarray(mu0), np.asarray(mu), rtol=1e-10)


def test_grad_pallas_matches_xla(rng):
    _, compact, _ = gapped_sym(rng, 80, 4)
    m = jnp.asarray(compact)
    g_x = jax.grad(lambda m: jnp.sum(sym_maxeig(m, iters=40,
                                                backend="xla")))(m)
    g_p = jax.grad(lambda m: jnp.sum(sym_maxeig(m, iters=40,
                                                backend="pallas")))(m)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-10, atol=1e-12)


def test_grad_is_eigvec_outer(rng):
    """At convergence, d mu / d A = v v^T (classical eigenvalue
    perturbation); in compact storage: diag v_i^2, offdiag 2 v_i v_j."""
    _, compact, _ = gapped_sym(rng, 40, 3)
    m = jnp.asarray(compact)
    mu, v = sym_maxeig(m, iters=200, return_vector=True)
    g = jax.grad(lambda m: jnp.sum(sym_maxeig(m, iters=200)))(m)
    v = np.asarray(v)
    want = np.stack(
        [v[:, 0] ** 2, v[:, 1] ** 2, v[:, 2] ** 2,
         2 * v[:, 0] * v[:, 1], 2 * v[:, 0] * v[:, 2],
         2 * v[:, 1] * v[:, 2]], axis=-1)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6, atol=1e-9)


def test_zero_matrix_finite():
    m = jnp.zeros((10, 6))
    mu, v = sym_maxeig(m, iters=30, return_vector=True)
    assert np.isfinite(np.asarray(mu)).all()
    assert np.isfinite(np.asarray(v)).all()
    np.testing.assert_allclose(np.asarray(mu), 0.0)


def test_half_contract(rng):
    _, compact, dom = gapped_sym(rng, 64, 4)
    mu = sym_maxeig(jnp.asarray(compact, jnp.bfloat16), iters=60)
    assert mu.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(mu, np.float64), dom, rtol=0.05)


def test_validation():
    with pytest.raises(ValueError):
        sym_maxeig(jnp.zeros((4, 7)))  # 7 not triangular
    with pytest.raises(ValueError):
        sym_maxeig(jnp.zeros((4, 6)), iters=-1)
    with pytest.raises(ValueError):
        sym_maxeig(jnp.zeros((4, 6)), v0=jnp.zeros((4,)))  # N=3 != 4
    for bad in (0, 17, -3):
        with pytest.raises(ValueError):
            sym_maxeig(jnp.zeros((4, 6)), renorm_every=bad)


@pytest.mark.parametrize("n", [3, 8, 12])
@pytest.mark.parametrize("renorm", [1, 5, 16])
def test_renorm_stride_parity(n, renorm, rng):
    """Power iteration is scale-invariant: any renormalization stride
    converges to the same eigenpair (the kernel's Gershgorin pre-scale
    keeps intermediate iterates in range)."""
    _, compact, dom = gapped_sym(rng, 100, n)
    mu = sym_maxeig(jnp.asarray(compact), iters=120, backend="pallas",
                    renorm_every=renorm)
    np.testing.assert_allclose(np.asarray(mu), dom, rtol=1e-10)


@pytest.mark.parametrize("scale", [1e30, 1e-30])
def test_renorm_extreme_scale_f32(scale, rng):
    """f32 range safety of the strided renormalization: without the
    per-lane Gershgorin pre-scale, 8 unnormalized matvecs at
    ||A|| ~ 1e30 would overflow f32 (1e240 >> 3e38); with it the
    iteration is scale-free."""
    _, compact, dom = gapped_sym(rng, 50, 4)
    m = jnp.asarray(compact * scale, jnp.float32)
    mu = sym_maxeig(m, iters=40, backend="pallas", renorm_every=8)
    assert np.isfinite(np.asarray(mu)).all()
    np.testing.assert_allclose(np.asarray(mu, np.float64), dom * scale,
                               rtol=2e-5)


@pytest.mark.parametrize("backend", ["pallas", "xla"])
def test_extreme_scale_grad_f32(backend, rng):
    """Both paths (kernel + VJP replay, and the XLA fallback) must
    pre-scale: an unscaled f32 matvec at ||A|| ~ 1e25 overflows the
    norm^2 and `_guarded_rsqrt(inf) = 0` silently zeroes the iterate —
    value AND gradient must stay finite and scale like the input."""
    _, compact, dom = gapped_sym(rng, 20, 3)
    scale = 1e25
    m = jnp.asarray(compact * scale, jnp.float32)
    mu, v = sym_maxeig(m, iters=40, backend=backend, return_vector=True)
    assert np.isfinite(np.asarray(mu)).all()
    np.testing.assert_allclose(np.asarray(mu, np.float64), dom * scale,
                               rtol=2e-5)
    g = jax.grad(lambda m: jnp.sum(sym_maxeig(m, iters=40,
                                              backend=backend)))(m)
    g = np.asarray(g, np.float64)
    assert np.isfinite(g).all() and (np.abs(g).max(axis=-1) > 0.1).all()
    # at convergence dmu/dA = v v^T, scale-free: diag entries = v_i^2
    v = np.asarray(v, np.float64)
    np.testing.assert_allclose(g[:, :3], v ** 2, rtol=1e-3, atol=1e-4)


class TestMatvecChain:
    """sym_matvec_chain — fused Richardson/Neumann iteration."""

    @pytest.mark.parametrize("n", [1, 2, 4, 6, 8, 12, 16])
    def test_parity_vs_numpy(self, n, rng):
        b = 200
        a = rng.standard_normal((b, n, n))
        A = (a + a.swapaxes(-1, -2)) / (6 * n)  # spectral radius << 1
        compact = np.asarray(full_to_sym(jnp.asarray(A)))
        v = rng.standard_normal((b, n))
        c = rng.standard_normal((b, n))
        k = 12
        from fastmath_tpu.ops.sym import sym_matvec_chain

        got_x = np.asarray(sym_matvec_chain(
            jnp.asarray(compact), jnp.asarray(v), k, add=jnp.asarray(c),
            backend="xla"))
        got_p = np.asarray(sym_matvec_chain(
            jnp.asarray(compact), jnp.asarray(v), k, add=jnp.asarray(c),
            backend="pallas"))
        x = v.copy()
        for _ in range(k):
            x = np.einsum("bij,bj->bi", A, x) + c
        np.testing.assert_allclose(got_x, x, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(got_p, x, rtol=1e-10, atol=1e-12)

    def test_neumann_series_sums_to_solve(self, rng):
        n, b = 4, 100
        a = rng.standard_normal((b, n, n))
        A = (a + a.swapaxes(-1, -2)) / (8 * n)
        compact = np.asarray(full_to_sym(jnp.asarray(A)))
        c = rng.standard_normal((b, n))
        from fastmath_tpu.ops.sym import sym_matvec_chain

        got = np.asarray(sym_matvec_chain(
            jnp.asarray(compact), jnp.asarray(c), 200, add=jnp.asarray(c)))
        want = np.linalg.solve(np.eye(n) - A, c[..., None])[..., 0]
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    def test_grad_backends_match(self, rng):
        n, b = 3, 60
        a = rng.standard_normal((b, n, n))
        A = (a + a.swapaxes(-1, -2)) / (6 * n)
        compact = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(A))))
        v = jnp.asarray(rng.standard_normal((b, n)))
        from fastmath_tpu.ops.sym import sym_matvec_chain

        for be in ("xla", "pallas"):
            gl = jax.grad(lambda m, be=be: jnp.sum(
                sym_matvec_chain(m, v, 8, add=v, backend=be) ** 2))(compact)
            if be == "xla":
                ref = gl
            else:
                np.testing.assert_allclose(np.asarray(gl), np.asarray(ref),
                                           rtol=1e-9, atol=1e-11)

    def test_iters0_and_validation(self, rng):
        from fastmath_tpu.ops.sym import sym_matvec_chain

        v = jnp.asarray(rng.standard_normal((5, 3)))
        m = jnp.asarray(rng.standard_normal((5, 6)))
        out = sym_matvec_chain(m, v, 0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(v))
        with pytest.raises(ValueError):
            sym_matvec_chain(m, v, -1)


class TestReviewRegressions:
    """Round-3 code-review findings (iters-gate + layout ambiguity)."""

    def test_chain_forced_pallas_iters1_validates(self, rng):
        """backend='pallas' must be validated (and honored) at iters=1
        too — previously the iters>1 gate silently ran the XLA scan."""
        from fastmath_tpu.ops.sym import sym_matvec_chain, sym_solve_chain

        diag = jnp.asarray(rng.standard_normal((5, 3)) ** 2 + 1)  # diagonal
        v = jnp.asarray(rng.standard_normal((5, 3)))
        for op in (sym_matvec_chain, sym_solve_chain):
            with pytest.raises(ValueError):
                op(diag, v, 1, backend="pallas")
            # supported (compact) layout: kernel serves iters=1
            comp = jnp.asarray(rng.standard_normal((5, 6)))
            comp = comp.at[..., :3].add(4.0)
            out_p = np.asarray(op(comp, v, 1, backend="pallas"))
            out_x = np.asarray(op(comp, v, 1, backend="xla"))
            np.testing.assert_allclose(out_p, out_x, rtol=1e-10,
                                       atol=1e-12)

    def test_maxeig_forced_pallas_iters0_validates(self, rng):
        from fastmath_tpu.ops.sym import sym_maxeig

        diag = jnp.asarray(rng.standard_normal((5, 3)) ** 2 + 1)
        v = jnp.asarray(rng.standard_normal((5, 3)))
        with pytest.raises(ValueError):
            sym_maxeig(diag, iters=0, v0=v, backend="pallas")

    def test_maxeig_diagonal_layout_via_v0(self, rng):
        """nn = 6 is both a valid diagonal (6x6) and compact (3x3)
        size; v0 pins N and routes diagonal storage through the XLA
        path with the right answer (previously misparsed as 3x3)."""
        from fastmath_tpu.ops.sym import sym_maxeig

        d = np.abs(rng.standard_normal((20, 6))) + 0.1
        d[:, 2] = 9.0  # dominant
        v0 = jnp.asarray(rng.standard_normal((20, 6)))
        mu = np.asarray(sym_maxeig(jnp.asarray(d), iters=80, v0=v0))
        np.testing.assert_allclose(mu, 9.0, rtol=1e-8)
