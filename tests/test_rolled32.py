"""Rolled stacked-grid tier at 17 <= n <= 32.

The fori_loop-rolled one-hot PLU / parallel-order Jacobi machinery is
n-generic; this file pins the extension of every rolled-capable kernel
family past the BASELINE <=16x16 gate up to n = 32 (the reference's
jitfields kernels had no N cap at all — reference ``sym.py:28-37``).
Interpret mode on CPU; the hardware Mosaic lowering (incl. the raised
scoped-VMEM limits these sizes need) is covered by
``tests/test_tpu_smoke.py`` and ``bench/tpu_probe_round3.py``.

Small batches: one fori_loop step per n keeps interpret compile O(1),
so n = 32 costs about the same to trace as n = 16.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.layouts import full_to_sym
from fastmath_tpu.kernels import batched_pallas as BP
from fastmath_tpu.kernels import eig_pallas as EP
from fastmath_tpu.kernels import sym_pallas as SP

_B = 192  # deliberately NOT a multiple of 128: covers the pad path


def _spd(rng, b, n):
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    return np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(
        n, dtype=np.float32)


def _cf_full(spd):
    b, n, _ = spd.shape
    return jnp.moveaxis(jnp.asarray(spd.reshape(b, n * n)), 0, -1)


def _cf_compact(spd):
    return jnp.moveaxis(
        jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd)))), 0, -1)


@pytest.fixture
def rng():
    return np.random.default_rng(32)


@pytest.mark.parametrize("n", [20, 32])
def test_inv_cf_rolled32(rng, n):
    spd = _spd(rng, _B, n)
    inv = np.asarray(jnp.moveaxis(BP.inv_cf(_cf_full(spd)), -1, 0))
    want = np.linalg.inv(spd.astype(np.float64))
    nw = np.linalg.norm(inv.reshape(_B, n, n) - want, axis=(-2, -1))
    nw /= np.linalg.norm(want, axis=(-2, -1))
    assert nw.max() < 1e-5


@pytest.mark.parametrize("n", [20, 32])
def test_logdet_cf_rolled32(rng, n):
    spd = _spd(rng, _B, n)
    ld = np.asarray(BP.logdet_cf(_cf_full(spd)))
    want = np.linalg.slogdet(spd.astype(np.float64))[1]
    assert np.abs(ld - want).max() < 1e-4 * max(1.0, np.abs(want).max())


@pytest.mark.parametrize("n", [20, 32])
def test_solve_full_cf_rolled32(rng, n):
    spd = _spd(rng, _B, n)
    rhs = rng.standard_normal((_B, n, 2)).astype(np.float32)
    rcf = jnp.moveaxis(jnp.asarray(rhs.reshape(_B, n * 2)), 0, -1)
    x = np.asarray(jnp.moveaxis(
        BP.solve_full_cf(_cf_full(spd), rcf, k=2), -1, 0)).reshape(_B, n, 2)
    want = np.linalg.solve(spd.astype(np.float64), rhs.astype(np.float64))
    nw = np.linalg.norm(x - want, axis=(-2, -1))
    nw /= np.linalg.norm(want, axis=(-2, -1))
    assert nw.max() < 1e-5


@pytest.mark.parametrize("n", [20, 32])
def test_sym_solve_cf_rolled32(rng, n):
    spd = _spd(rng, _B, n)
    v = rng.standard_normal((_B, n)).astype(np.float32)
    vf = jnp.moveaxis(jnp.asarray(v), 0, -1)
    x = np.asarray(jnp.moveaxis(SP.sym_solve_cf(_cf_compact(spd), vf),
                                -1, 0))
    want = np.linalg.solve(spd.astype(np.float64),
                           v.astype(np.float64)[..., None])[..., 0]
    nw = np.linalg.norm(x - want, axis=-1) / np.linalg.norm(want, axis=-1)
    assert nw.max() < 1e-5


def test_sym_invert_det_cf_rolled32(rng):
    n = 32
    spd = _spd(rng, _B, n)
    cm = _cf_compact(spd)
    inv_c = np.asarray(jnp.moveaxis(SP.sym_invert_cf(cm), -1, 0))
    from fastmath_tpu.layouts import sym_to_full

    inv = np.asarray(sym_to_full(jnp.asarray(inv_c), n))
    want = np.linalg.inv(spd.astype(np.float64))
    nw = np.linalg.norm(inv - want, axis=(-2, -1))
    nw /= np.linalg.norm(want, axis=(-2, -1))
    assert nw.max() < 1e-5
    # det in f32 needs eigenvalues ~O(1): prod of 32 of them overflows
    # otherwise (use batchlogdet/logdet_cf for log-domain at this n)
    spd_s = spd / (2.0 * n)
    det = np.asarray(SP.sym_det_cf(_cf_compact(spd_s)))
    wdet = np.linalg.det(spd_s.astype(np.float64))
    assert (np.abs(det - wdet) / np.abs(wdet)).max() < 1e-3


def test_sym_chain_maxeig_rolled32(rng):
    n = 32
    spd = _spd(rng, _B, n)
    cm = _cf_compact(spd)
    v = rng.standard_normal((_B, n)).astype(np.float32)
    vf = jnp.moveaxis(jnp.asarray(v), 0, -1)
    x = np.asarray(jnp.moveaxis(
        SP.sym_solve_chain_cf(cm, vf, iters=4, add=vf), -1, 0))
    want = v.astype(np.float64)
    for _ in range(4):
        want = np.linalg.solve(spd.astype(np.float64),
                               want[..., None])[..., 0] + v
    nw = np.linalg.norm(x - want, axis=-1) / np.linalg.norm(want, axis=-1)
    assert nw.max() < 1e-4
    # matvec chain: contractive A keeps the k-step product in range
    c = (0.5 / n) * np.asarray(full_to_sym(jnp.asarray(spd)))
    cmc = jnp.moveaxis(jnp.asarray(c), 0, -1)
    y = np.asarray(jnp.moveaxis(
        SP.sym_matvec_chain_cf(cmc, vf, iters=3, add=vf), -1, 0))
    wy = v.astype(np.float64)
    a64 = (0.5 / n) * spd.astype(np.float64)
    for _ in range(3):
        wy = (a64 @ wy[..., None])[..., 0] + v
    assert (np.linalg.norm(y - wy, axis=-1)
            / np.linalg.norm(wy, axis=-1)).max() < 1e-4
    v0 = jnp.moveaxis(jnp.asarray(
        rng.standard_normal((_B, n)).astype(np.float32)), 0, -1)
    me = np.asarray(jnp.moveaxis(SP.sym_maxeig_cf(cm, v0, iters=96), -1, 0))
    wmax = np.linalg.eigvalsh(spd.astype(np.float64))[:, -1]
    # row 0 is the Rayleigh-quotient eigenvalue estimate
    assert np.median(np.abs(me[:, 0] - wmax) / wmax) < 1e-5


@pytest.mark.parametrize("n", [20, 32])
def test_eig_cf_rolled32(rng, n):
    spd = _spd(rng, 128, n)
    w = np.sort(np.asarray(jnp.moveaxis(
        EP.eig_sym_cf(_cf_compact(spd)), -1, 0)), -1)
    want = np.sort(np.linalg.eigvalsh(spd.astype(np.float64)), -1)
    assert np.abs(w - want).max() / np.abs(want).max() < 1e-5


def test_eig_cf_rolled32_vectors(rng):
    n = 24
    spd = _spd(rng, 128, n)
    w, u = EP.eig_sym_cf(_cf_compact(spd), compute_u=True)
    w = np.asarray(jnp.moveaxis(w, -1, 0))
    u = np.asarray(jnp.moveaxis(u, -1, 0)).reshape(-1, n, n)
    recon = np.einsum("bij,bj,bkj->bik", u, w, u)
    assert np.abs(recon - spd).max() < 1e-3 * np.abs(spd).max()


@pytest.mark.parametrize("n", [20, 32])
def test_chol_cf_rolled32(rng, n):
    spd = _spd(rng, _B, n)
    got = np.asarray(jnp.moveaxis(BP.chol_cf(_cf_compact(spd)), -1, 0))
    want = np.linalg.cholesky(spd.astype(np.float64))
    # compact slots: diag first; slot (i < j) holds L[j][i]
    from fastmath_tpu.layouts.sym import tri_index

    full = np.zeros((_B, n, n))
    for i in range(n):
        full[:, i, i] = got[:, i]
        for j in range(i):
            full[:, i, j] = got[:, tri_index(i, j, n)]
    nw = np.linalg.norm(full - want, axis=(-2, -1))
    nw /= np.linalg.norm(want, axis=(-2, -1))
    assert nw.max() < 1e-5


def test_chol_rolled_vjp(rng):
    """The rolled tier's VJP rides the batch-major XLA cholesky
    reference (_chol_ref_bm) — check it against the unrolled-XLA
    pullback through the public op.

    Gradients are compared after symmetrization: batchchol is defined
    on symmetric input, and the two backends attribute the cotangent
    differently off the manifold (the pallas path averages the
    triangles via full_to_sym, so dA splits across both; the unrolled
    XLA path reads only the lower triangle). The symmetric projection
    (g + g^T)/2 — the only part that matters for symmetric inputs —
    must agree exactly."""
    n = 12
    spd = jnp.asarray(_spd(rng, 16, n).astype(np.float64))
    from fastmath_tpu.ops.batched import batchchol

    w = jnp.asarray(rng.standard_normal((16, n, n)))

    def loss(be):
        return lambda a: jnp.sum(batchchol(a, backend=be) * w)

    gp = np.asarray(jax.grad(loss("pallas"))(spd))
    gx = np.asarray(jax.grad(loss("xla"))(spd))
    gp = 0.5 * (gp + gp.swapaxes(-1, -2))
    gx = 0.5 * (gx + gx.swapaxes(-1, -2))
    np.testing.assert_allclose(gp, gx, rtol=1e-9, atol=1e-10)


def test_jhj_rolled(rng):
    """Rolled congruence-product tier (7 <= max(K, D) <= 32): forward
    parity vs the densify+einsum XLA path and VJP agreement (the
    rolled bwd is the batch-major MXU matmul form)."""
    k, d, b = 20, 12, 64
    from fastmath_tpu.ops import sym as S

    J = rng.standard_normal((b, k, d)).astype(np.float32)
    a = rng.standard_normal((b, k, k)).astype(np.float32)
    Hf = (a + a.swapaxes(-1, -2)) / 2
    hc = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(Hf))))
    got = np.asarray(S.sym_matmul(jnp.asarray(J), hc, backend="pallas"),
                     np.float64)
    want = np.asarray(full_to_sym(jnp.asarray(
        np.einsum("bki,bkl,blj->bij", J.astype(np.float64),
                  Hf.astype(np.float64), J.astype(np.float64)))))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
    J64, h64 = jnp.asarray(J, jnp.float64), jnp.asarray(hc, jnp.float64)
    w = jnp.asarray(rng.standard_normal((b, d * (d + 1) // 2)))

    def loss(be):
        return lambda jj, hh: jnp.sum(S.sym_matmul(jj, hh, backend=be) * w)

    gp = jax.grad(loss("pallas"), argnums=(0, 1))(J64, h64)
    gx = jax.grad(loss("xla"), argnums=(0, 1))(J64, h64)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                   rtol=1e-12, atol=1e-12)
    # cap: 33 must raise from the routing layer
    with pytest.raises(ValueError):
        S.sym_matmul(jnp.ones((4, 33, 3)), jnp.ones((4, 33 * 34 // 2)),
                     backend="pallas")


def test_public_routing_accepts_n32(rng):
    """backend='pallas' must be honored (not raise) through the public
    ops at n = 32 — the routing layer's `supported` gate follows the
    kernel caps."""
    n, b = 32, 192
    spd = _spd(rng, b, n)
    from fastmath_tpu.ops import batched as B
    from fastmath_tpu.ops import sym as S

    inv = np.asarray(B.batchinv(jnp.asarray(spd), backend="pallas"))
    want = np.linalg.inv(spd.astype(np.float64))
    nw = np.linalg.norm(inv - want, axis=(-2, -1))
    nw /= np.linalg.norm(want, axis=(-2, -1))
    assert nw.max() < 1e-5
    cm = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd))))
    v = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    x = np.asarray(S.sym_solve(cm, v, backend="pallas"))
    wx = np.linalg.solve(spd.astype(np.float64),
                         np.asarray(v, np.float64)[..., None])[..., 0]
    nw = np.linalg.norm(x - wx, axis=-1) / np.linalg.norm(wx, axis=-1)
    assert nw.max() < 1e-5


def test_eig_rolled_small_block_pinned(rng):
    """The rolled eig tier pins block = 1024 (Mosaic sublane rule:
    block/128 must be a multiple of 8): a caller's smaller block must
    not leak through — regression for the min() clamp that let
    block=512 reach the kernel."""
    from fastmath_tpu.kernels.eig_pallas import eig_sym_cf

    n, b = 12, 256
    spd = _spd(rng, b, n)
    cm = np.asarray(full_to_sym(jnp.asarray(spd))).T.copy()
    w = eig_sym_cf(jnp.asarray(cm), block=512)
    want = np.sort(np.linalg.eigvalsh(spd.astype(np.float64)), -1)
    got = np.sort(np.asarray(w).T, -1)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_forward_mode_via_xla_backend(rng):
    """The documented escape hatch for forward-mode AD: backend='xla'
    keeps jax.jacfwd working at sizes the auto route would send to the
    (reverse-mode-only) custom-VJP Pallas kernels on TPU."""
    from fastmath_tpu.ops import batched as B

    n, b = 18, 4
    spd = _spd(rng, b, n).astype(np.float64)
    a = jnp.asarray(spd)
    # symmetric tangent: numpy's cholesky reads only the lower
    # triangle while JAX's jvp rule symmetrizes — they agree only for
    # symmetric perturbations (the relevant ones for an SPD input)
    g = rng.standard_normal(a.shape)
    tang = jnp.asarray((g + np.swapaxes(g, -1, -2)) / 2)
    _, jv = jax.jvp(lambda m: B.batchchol(m, backend="xla"), (a,), (tang,))
    eps = 1e-6
    fd = (np.linalg.cholesky(spd + eps * np.asarray(tang))
          - np.linalg.cholesky(spd - eps * np.asarray(tang))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(jv), fd, rtol=2e-4, atol=2e-4)
