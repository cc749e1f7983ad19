"""Parity tests for Lie ops vs scipy.linalg (expm/logm oracles, SE(3))."""
import numpy as np
import scipy.linalg as sla
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.ops import lie as L


def se3_batch(rng, b, scale=1.0):
    """Random se(3) log-matrices (4x4, last row zero)."""
    X = np.zeros((b, 4, 4))
    w = rng.standard_normal((b, 3)) * scale
    v = rng.standard_normal((b, 3)) * scale
    X[:, 0, 1], X[:, 0, 2], X[:, 1, 2] = -w[:, 2], w[:, 1], -w[:, 0]
    X = X - np.swapaxes(X, -1, -2)
    X[:, :3, 3] = v
    X[:, 3, :] = 0
    return X


@pytest.mark.parametrize("scale", [0.1, 1.0, 5.0, 50.0])
def test_expm_se3(scale, rng):
    X = se3_batch(rng, 8, scale)
    got = np.asarray(L.expm(jnp.asarray(X)))
    want = np.stack([sla.expm(x) for x in X])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_expm_general(rng):
    X = rng.standard_normal((10, 5, 5))
    got = np.asarray(L.expm(jnp.asarray(X)))
    want = np.stack([sla.expm(x) for x in X])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_expm_basis(rng):
    # so(3) basis
    basis = np.zeros((3, 3, 3))
    basis[0, 1, 2], basis[0, 2, 1] = -1, 1
    basis[1, 0, 2], basis[1, 2, 0] = 1, -1
    basis[2, 0, 1], basis[2, 1, 0] = -1, 1
    coef = rng.standard_normal((6, 3))
    got = np.asarray(L.expm(jnp.asarray(coef), jnp.asarray(basis)))
    logmat = np.einsum("bf,fij->bij", coef, basis)
    want = np.stack([sla.expm(x) for x in logmat])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_logm_se3(rng):
    X = se3_batch(rng, 8, 0.8)
    M = np.stack([sla.expm(x) for x in X])
    got = np.asarray(L.logm(jnp.asarray(M)))
    want = np.stack([np.real(sla.logm(m)) for m in M])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


def test_logm_spd(rng):
    a = rng.standard_normal((12, 6, 6))
    spd = np.einsum("...ij,...kj->...ik", a, a) + 6 * np.eye(6)
    got = np.asarray(L.logm(jnp.asarray(spd)))
    want = np.stack([np.real(sla.logm(m)) for m in spd])
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)


def test_logm_expm_roundtrip(rng):
    X = se3_batch(rng, 6, 0.5)
    back = np.asarray(L.logm(L.expm(jnp.asarray(X))))
    np.testing.assert_allclose(back, X, rtol=1e-8, atol=1e-9)


def test_expm_derivatives(rng):
    basis = np.zeros((3, 3, 3))
    basis[0, 1, 2], basis[0, 2, 1] = -1, 1
    basis[1, 0, 2], basis[1, 2, 0] = 1, -1
    basis[2, 0, 1], basis[2, 1, 0] = -1, 1
    coef = jnp.asarray(rng.standard_normal((3,)) * 0.5)
    b = jnp.asarray(basis)
    E, dX, hX = L.expm_derivatives(coef, b, grad_X=True, hess_X=True)
    assert dX.shape == (3, 3, 3)
    assert hX.shape == (3, 3, 3, 3)
    # finite differences on coefficients
    h = 1e-6
    for i in range(3):
        e = jnp.zeros(3).at[i].set(h)
        fd = (np.asarray(L.expm(coef + e, b)) - np.asarray(L.expm(coef - e, b))) / (2 * h)
        np.testing.assert_allclose(np.asarray(dX[i]), fd, rtol=1e-5, atol=1e-7)
    # hessian symmetric in (F, F)
    np.testing.assert_allclose(np.asarray(hX), np.asarray(hX).transpose(1, 0, 2, 3),
                               rtol=1e-8, atol=1e-10)


def test_expm_grad(rng):
    X = jnp.asarray(rng.standard_normal((2, 4, 4)) * 0.5)

    def loss(x):
        return jnp.sum(L.expm(x) ** 2)

    g = jax.grad(loss)(X)
    h = 1e-6
    for idx in [(0, 1, 2), (1, 3, 0)]:
        e = jnp.zeros_like(X).at[idx].set(h)
        fd = (loss(X + e) - loss(X - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd), rtol=1e-5)


def test_meanm_se3(rng):
    X = se3_batch(rng, 10, 0.3)
    M = np.stack([sla.expm(x) for x in X])
    mean = np.asarray(L.meanm(jnp.asarray(M)))
    # fixed-point condition: mean of logm(mean^-1 A_n) ~ 0
    resid = np.stack([np.real(sla.logm(np.linalg.solve(mean, m))) for m in M])
    np.testing.assert_allclose(resid.mean(0), 0, atol=1e-7)


def test_meanm_identity():
    eye = jnp.eye(4)[None].repeat(5, 0)
    mean = np.asarray(L.meanm(eye))
    np.testing.assert_allclose(mean, np.eye(4), atol=1e-12)


def _R3(axis, ang):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def _scipy_realcast(A):
    ref = sla.logm(A, disp=False)[0]
    return ref.real if np.iscomplexobj(ref) else ref


@pytest.mark.parametrize(
    "name,mat,tol",
    [
        ("minus_eye", -np.eye(2), 1e-12),
        ("diag_neg_pos", np.diag([-1.0, 2.0]), 1e-12),
        ("diag_two_neg", np.diag([-4.0, -0.25, 3.0]), 1e-12),
        ("rot_pi_z", np.diag([-1.0, -1.0, 1.0]), 1e-12),
        ("jordan_neg", np.array([[-1.0, 1.0], [0.0, -1.0]]), 1e-9),
    ],
)
def test_logm_branch_cut_realcast(name, mat, tol):
    """Real inputs with eigenvalues on the negative real axis return the
    real part of the complex principal log, matching the reference's
    scipy real-cast (``_impl/logm.py:76-83``)."""
    want = _scipy_realcast(mat)
    got = np.asarray(L.logm(jnp.asarray(mat)))
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_logm_branch_cut_reflection(rng):
    v = rng.standard_normal(3)
    v /= np.linalg.norm(v)
    H = np.eye(3) - 2 * np.outer(v, v)
    got = np.asarray(L.logm(jnp.asarray(H)))
    np.testing.assert_allclose(got, _scipy_realcast(H), atol=1e-12)


def test_logm_branch_cut_rotation_pi_random_axis(rng):
    R = _R3(rng.standard_normal(3), np.pi)
    got = np.asarray(L.logm(jnp.asarray(R)))
    np.testing.assert_allclose(got, _scipy_realcast(R), atol=1e-10)


def test_logm_branch_cut_nonnormal(rng):
    V = rng.standard_normal((4, 4))
    A = V @ np.diag([-2.0, -0.5, 1.5, 3.0]) @ np.linalg.inv(V)
    got = np.asarray(L.logm(jnp.asarray(A)))
    np.testing.assert_allclose(got, _scipy_realcast(A), rtol=1e-8,
                               atol=1e-8)


@pytest.mark.parametrize("eps_ang", [1e-2, 1e-3, 1e-6])
def test_logm_rotation_near_pi(eps_ang):
    """Rotations near (but off) pi have a real principal log; whichever
    internal path handles them, the result must match scipy."""
    th = np.pi - eps_ang
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    got = np.asarray(L.logm(jnp.asarray(R)))
    np.testing.assert_allclose(got, _scipy_realcast(R), rtol=1e-6,
                               atol=1e-8)


def test_logm_mixed_batch_no_poisoning(rng):
    """One on-cut matrix in a batch must not corrupt the others
    (regression: the global while_loop convergence tests used to see
    its NaN distance and early-exit for the whole batch)."""
    good = sla.expm(rng.standard_normal((3, 3)) * 0.4)
    batch = np.stack([np.diag([-1.0, -1.0, 1.0]), good, np.eye(3) * 2.0])
    got = np.asarray(L.logm(jnp.asarray(batch)))
    for i in range(3):
        np.testing.assert_allclose(
            got[i], _scipy_realcast(batch[i]), rtol=1e-9, atol=1e-10
        )


def test_logm_complex_input(rng):
    A = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
    A = A + 3 * np.eye(3)
    got = np.asarray(L.logm(jnp.asarray(A)))
    want = sla.logm(A, disp=False)[0]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_logm_complex_negative_eig():
    A = np.diag([-2.0 + 0j, 1.5 + 0.5j])
    got = np.asarray(L.logm(jnp.asarray(A)))
    want = sla.logm(A, disp=False)[0]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_meanm_rotations_including_pi(rng):
    """meanm iterates on the real-cast logm (reference ``lie.py:80-82``
    semantics) and stays finite on batches that swing across the cut."""
    mats = np.stack([
        _R3(rng.standard_normal(3), a) for a in [0.3, 2.0, np.pi, -2.8]
    ])
    mean = np.asarray(L.meanm(jnp.asarray(mats)))
    assert np.isfinite(mean).all()
    # the barycenter of rotations is (close to) a rotation
    np.testing.assert_allclose(mean @ mean.T, np.eye(3), atol=1e-6)


def test_logm_grad_branch_cut(rng):
    """VJP through the exceptional path vs finite differences (the
    real-cast map is smooth in the real part around a reflection)."""
    A = np.diag([-2.0, 0.5, 1.5]) + 0.01 * rng.standard_normal((3, 3))
    co = rng.standard_normal((3, 3))

    def loss(m):
        return jnp.sum(jnp.asarray(co) * L.logm(m))

    g = np.asarray(jax.grad(loss)(jnp.asarray(A)))
    h = 1e-6
    for idx in [(0, 0), (1, 2), (2, 1)]:
        e = np.zeros_like(A)
        e[idx] = h
        fd = (float(loss(jnp.asarray(A + e)))
              - float(loss(jnp.asarray(A - e)))) / (2 * h)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-4, atol=1e-6)


def test_logm_grad_mathias(rng):
    """logm custom VJP (Mathias block chain rule) vs finite differences."""
    import jax
    import jax.numpy as jnp
    from fastmath_tpu.ops.lie import expm, logm

    X = rng.standard_normal((4, 3, 3)) * 0.4
    A = np.asarray(expm(jnp.asarray(X)))
    Aj = jnp.asarray(A)
    co = jnp.asarray(rng.standard_normal(A.shape))

    def loss(m):
        return jnp.sum(co * logm(m))

    g = np.asarray(jax.grad(loss)(Aj))
    h = 1e-6
    for idx in [(0, 0, 0), (1, 2, 1), (3, 0, 2)]:
        e = np.zeros_like(A); e[idx] = h
        fd = (float(loss(jnp.asarray(A + e))) - float(loss(jnp.asarray(A - e)))) / (2 * h)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-4, atol=1e-7)


def test_logm_grad_roundtrip_identity(rng):
    """grad of sum(logm(expm(X))) == grad of sum(X) = ones (chain rule
    sanity through both custom/AD paths)."""
    import jax
    import jax.numpy as jnp
    from fastmath_tpu.ops.lie import expm, logm

    X = jnp.asarray(rng.standard_normal((2, 3, 3)) * 0.3)
    g = np.asarray(jax.grad(lambda x: jnp.sum(logm(expm(x))))(X))
    np.testing.assert_allclose(g, np.ones_like(g), rtol=1e-6, atol=1e-6)


def test_logm_branch_cut_collision_guard(rng):
    """Normal-route eigenvalue collision (Re l1 + t Im l1 == Re l2 +
    t Im l2 for distinct eigenvalues) must fall through to the shift
    route via the reconstruction check, not return a silently mixed
    eigenspace (code-review r2 finding #5)."""
    t = 0.7390851332151607
    b = 1.0
    a = -2.0 + t * b  # C-eigenvalue of the pair's upper member == -2
    M = np.zeros((3, 3))
    M[0, 0] = -2.0
    M[1:, 1:] = [[a, -b], [b, a]]
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    A = q @ M @ q.T  # dense, normal, eigenvalues {-2, a+-bi}
    got = np.asarray(L.logm(jnp.asarray(A)))
    np.testing.assert_allclose(got, _scipy_realcast(A), rtol=1e-7,
                               atol=1e-7)


def test_logm_f32_tail(rng):
    """The ISS chain tracks A - I cancellation-free (Al-Mohy & Higham
    2012 recurrence), keeping the f32 roundtrip tail at the ~1e-5 level
    (VERDICT r2 item 9: was p99 ~6e-5 with the naive A - I)."""
    import jax.numpy as jnp
    from fastmath_tpu.ops import lie as L

    X = (rng.standard_normal((20000, 4, 4)) * 0.5).astype(np.float32)
    E = np.asarray(L.expm(jnp.asarray(X)))
    got = np.asarray(L.logm(jnp.asarray(E)))
    rel = np.abs(got - X) / (np.abs(X) + 1e-30)
    assert np.median(rel) < 1e-6
    assert np.quantile(rel, 0.99) < 3e-5  # was ~6e-5 before the fix


# --- symmetric eig route for 24 < d <= 32 (VERDICT r3 missing #2) ----------


def _scipy_realcast_logm(batch):
    return np.stack([np.real(sla.logm(m.astype(np.float64)))
                     for m in batch])


def test_logm_sym_eig_route_spd(rng):
    """V.log|w|.V^T through the eig tier matches scipy real-cast for
    SPD input at d > 24 (the logm kernel's cap). On TPU this is the
    auto route for all-symmetric batches; here the helper is exercised
    directly (the gate in _logm_plain is TPU-only)."""
    from fastmath_tpu.ops.lie import _logm_sym_eig

    d, b = 28, 12
    a = rng.standard_normal((b, d, d)).astype(np.float32)
    spd = (np.einsum("...ij,...kj->...ik", a, a) / d
           + np.eye(d, dtype=np.float32))
    L_, ok = _logm_sym_eig(jnp.asarray(spd))
    assert bool(jnp.all(ok))
    want = _scipy_realcast_logm(spd)
    nw = (np.linalg.norm((np.asarray(L_, np.float64) - want)
                         .reshape(b, -1), axis=-1)
          / np.linalg.norm(want.reshape(b, -1), axis=-1))
    assert nw.max() < 1e-5, nw.max()


def test_logm_sym_eig_route_indefinite(rng):
    """Symmetric with negative eigenvalues: the route returns the
    real-cast principal log (V log|w| V^T) — same branch-cut contract
    as the main path (reference `_impl/logm.py:81-83`)."""
    from fastmath_tpu.ops.lie import _logm_sym_eig

    d, b = 26, 8
    a = rng.standard_normal((b, d, d)).astype(np.float32)
    sym = 0.5 * (a + np.swapaxes(a, -1, -2)) + 0.0
    # push eigenvalues away from 0 to keep the oracle well-posed
    w, v = np.linalg.eigh(sym.astype(np.float64))
    w = np.where(np.abs(w) < 0.3, np.sign(w) * 0.3 + (w == 0) * 0.3, w)
    sym = np.einsum("...ik,...k,...jk->...ij", v, w, v).astype(np.float32)
    sym = 0.5 * (sym + np.swapaxes(sym, -1, -2))
    L_, ok = _logm_sym_eig(jnp.asarray(sym))
    assert bool(jnp.all(ok))
    want = _scipy_realcast_logm(sym)
    nw = (np.linalg.norm((np.asarray(L_, np.float64) - want)
                         .reshape(b, -1), axis=-1)
          / np.linalg.norm(want.reshape(b, -1), axis=-1))
    assert nw.max() < 2e-5, nw.max()


def test_symmetric_mask(rng):
    from fastmath_tpu.ops.lie import _symmetric_mask

    a = rng.standard_normal((6, 27, 27)).astype(np.float32)
    sym = 0.5 * (a + np.swapaxes(a, -1, -2))
    mask = np.asarray(_symmetric_mask(jnp.asarray(sym)))
    assert mask.all()
    mask2 = np.asarray(_symmetric_mask(jnp.asarray(a)))
    assert not mask2.any()
    # mixed batch
    mix = np.concatenate([sym[:3], a[:3]])
    mask3 = np.asarray(_symmetric_mask(jnp.asarray(mix)))
    assert mask3[:3].all() and not mask3[3:].any()


def test_logm_plain_sym_route_cond(rng, monkeypatch):
    """The d in (25..32) whole-batch cond picks the eig route for
    all-symmetric batches and ISS otherwise; both give (L, ok) that
    _logm_impl consumes identically. Forced here by faking the backend
    gate (the route is TPU-only in production; eig_sym auto on CPU is
    the XLA Jacobi, same algebra)."""
    import fastmath_tpu.ops.lie as lie_mod

    monkeypatch.setattr(lie_mod, "_on_tpu", lambda: True)
    # _logm_plain's d <= 24 branch would call the Pallas logm kernel
    # (interpret-mode minutes at d=28, and we want the 25..32 branch
    # anyway) — d=26 goes straight to the cond branch
    d, b = 26, 6
    a = rng.standard_normal((b, d, d)).astype(np.float32)
    spd = (np.einsum("...ij,...kj->...ik", a, a) / d
           + np.eye(d, dtype=np.float32))
    L_, ok = lie_mod._logm_plain(jnp.asarray(spd))
    assert bool(jnp.all(ok))
    want = _scipy_realcast_logm(spd)
    nw = (np.linalg.norm((np.asarray(L_, np.float64) - want)
                         .reshape(b, -1), axis=-1)
          / np.linalg.norm(want.reshape(b, -1), axis=-1))
    assert nw.max() < 1e-5, nw.max()
    # asymmetric batch: cond must fall to ISS and still be correct
    x = rng.standard_normal((b, d, d)).astype(np.float32) * (0.4 / d)
    e = np.asarray(lie_mod._expm_core(jnp.asarray(x)))
    L2, ok2 = lie_mod._logm_plain(jnp.asarray(e))
    assert bool(jnp.all(ok2))
    np.testing.assert_allclose(np.asarray(L2), x, rtol=1e-3, atol=2e-5)


def test_logm_plain_sym_route_cond_kernel_range(rng, monkeypatch):
    """Round 4: the symmetric eig route extends DOWN into the register
    kernel's range (12 <= d <= 24, measured 1.4-4x faster there) with
    the kernel as the cond fallback for asymmetric batches; and
    ``sym_route=False`` (meanm's contract) bypasses the cond entirely."""
    import fastmath_tpu.ops.lie as lie_mod

    monkeypatch.setattr(lie_mod, "_on_tpu", lambda: True)
    assert lie_mod._LOGM_SYM_EIG_MIN_D <= 12
    d, b = 12, 6
    a = rng.standard_normal((b, d, d)).astype(np.float32)
    spd = (np.einsum("...ij,...kj->...ik", a, a) / d
           + np.eye(d, dtype=np.float32))
    L_, ok = lie_mod._logm_plain(jnp.asarray(spd))
    assert bool(jnp.all(ok))
    want = _scipy_realcast_logm(spd)
    nw = (np.linalg.norm((np.asarray(L_, np.float64) - want)
                         .reshape(b, -1), axis=-1)
          / np.linalg.norm(want.reshape(b, -1), axis=-1))
    assert nw.max() < 1e-5, nw.max()
    # asymmetric batch at d=12: cond falls to the register kernel
    # (interpret mode here) and still returns the right log
    x = rng.standard_normal((b, d, d)).astype(np.float32) * (0.4 / d)
    e = np.asarray(lie_mod._expm_core(jnp.asarray(x)))
    L2, ok2 = lie_mod._logm_plain(jnp.asarray(e))
    assert bool(jnp.all(ok2))
    np.testing.assert_allclose(np.asarray(L2), x, rtol=1e-3, atol=2e-5)
    # sym_route=False: no cond — the symmetric batch goes through the
    # fallback tier (kernel here), not the eig route
    calls = []
    real_route = lie_mod._logm_sym_eig

    def spy(A):
        calls.append(A.shape)
        return real_route(A)

    monkeypatch.setattr(lie_mod, "_logm_sym_eig", spy)
    L3, ok3 = lie_mod._logm_plain(jnp.asarray(spd), sym_route=False)
    assert bool(jnp.all(ok3))
    assert not calls, "sym_route=False must not trace the eig route"
    nw3 = (np.linalg.norm((np.asarray(L3, np.float64) - want)
                          .reshape(b, -1), axis=-1)
           / np.linalg.norm(want.reshape(b, -1), axis=-1))
    assert nw3.max() < 1e-4, nw3.max()


def test_inv_small_routing(rng, monkeypatch):
    """The ISS inner inverse (`_inv_small`) uses the fused
    batchinv tier through d <= 8 and `jnp.linalg.inv` beyond — the
    rolled-Pallas-PLU variant for d = 25..32 was measured a 4x LOSS
    on hardware (two non-fusible HBM relayouts per while_loop
    iteration; docstring carries the record)."""
    import fastmath_tpu.ops.lie as lie_mod
    import fastmath_tpu.ops.batched as batched_mod

    calls = []
    real_batchinv = batched_mod.batchinv

    def spy(a, *args, **kw):
        calls.append(a.shape[-1])
        return real_batchinv(a, *args, **kw)

    monkeypatch.setattr(batched_mod, "batchinv", spy)

    def spd(d, dtype=np.float64):
        a = rng.standard_normal((4, d, d)).astype(dtype)
        return np.einsum("...ij,...kj->...ik", a, a) / d + np.eye(
            d, dtype=dtype)

    for d, routed in ((6, True), (8, True), (12, False), (28, False)):
        m = spd(d)
        got = np.asarray(lie_mod._inv_small(jnp.asarray(m)))
        np.testing.assert_allclose(
            got, np.linalg.inv(m), rtol=1e-8, atol=1e-10)
        assert (calls and calls[-1] == d) == routed, (d, calls)
    n_before = len(calls)
    # complex d > 8 and real d > 32 stay on jnp.linalg.inv
    mc = spd(12) + 1j * rng.standard_normal((4, 12, 12)) * 0.1
    mc = mc + np.conj(np.swapaxes(mc, -1, -2))  # normal-ish, invertible
    mc = mc @ np.conj(np.swapaxes(mc, -1, -2)) / 12 + np.eye(12)
    got = np.asarray(lie_mod._inv_small(jnp.asarray(mc)))
    np.testing.assert_allclose(got, np.linalg.inv(mc), rtol=1e-8,
                               atol=1e-10)
    m40 = spd(40)
    got = np.asarray(lie_mod._inv_small(jnp.asarray(m40)))
    np.testing.assert_allclose(got, np.linalg.inv(m40), rtol=1e-8,
                               atol=1e-10)
    assert len(calls) == n_before, "complex/d>32 must not route"


# --- one-pass coupled Taylor expm_derivatives (round 5, VERDICT #9) --------


def test_expm_derivatives_taylor_matches_jacfwd(rng):
    """The coupled Taylor recursion (reference `_impl/expm.py:190-212`
    scheme, one lax.while_loop) must agree with exact forward-mode
    derivatives of scaling-and-squaring for Lie-regime norms."""
    import jax.numpy as jnp

    B = np.zeros((6, 4, 4))
    B[0, 0, 3] = B[1, 1, 3] = B[2, 2, 3] = 1.0
    B[3, 0, 1], B[3, 1, 0] = 1.0, -1.0
    B[4, 0, 2], B[4, 2, 0] = 1.0, -1.0
    B[5, 1, 2], B[5, 2, 1] = 1.0, -1.0
    c = rng.standard_normal((5, 6)) * 0.4
    args = (jnp.asarray(c), jnp.asarray(B))
    kw = dict(grad_X=True, grad_basis=True, hess_X=True)
    out_t = L.expm_derivatives(*args, method="taylor", **kw)
    out_j = L.expm_derivatives(*args, method="jacfwd", **kw)
    for name, t, j in zip(("E", "dX", "dB", "hX"), out_t, out_j):
        np.testing.assert_allclose(np.asarray(t), np.asarray(j),
                                   rtol=1e-10, atol=1e-12, err_msg=name)
    # hessian symmetry in (F, F)
    hX = np.asarray(out_t[3])
    np.testing.assert_allclose(hX, np.swapaxes(hX, 1, 2), atol=1e-12)


def test_expm_derivatives_dB_finite_diff(rng):
    """dB[f, k, l, i, j] = dE_ij / dB[f, k, l] on BOTH methods (the
    jacfwd path's axis mapping shipped wrong through round 4 — only FD
    pins the layout)."""
    import jax.numpy as jnp

    B = rng.standard_normal((3, 3, 3)) * 0.3
    c = rng.standard_normal((3,)) * 0.4
    h = 1e-6
    for method in ("taylor", "jacfwd"):
        _, dB = L.expm_derivatives(jnp.asarray(c), jnp.asarray(B),
                                   grad_basis=True, method=method)
        for (f, k, l) in ((0, 1, 2), (2, 0, 0)):
            Bp, Bm = B.copy(), B.copy()
            Bp[f, k, l] += h
            Bm[f, k, l] -= h
            fd = (np.asarray(L.expm(jnp.asarray(c), jnp.asarray(Bp)))
                  - np.asarray(L.expm(jnp.asarray(c), jnp.asarray(Bm))
                               )) / (2 * h)
            np.testing.assert_allclose(np.asarray(dB)[f, k, l], fd,
                                       rtol=1e-4, atol=1e-7,
                                       err_msg=method)


def test_expm_derivatives_batched_shapes(rng):
    """Batched coefficients must yield per-sample jacobians (no
    cross-batch axes) on both methods."""
    import jax.numpy as jnp

    B = rng.standard_normal((4, 3, 3)) * 0.2
    c = rng.standard_normal((2, 5, 4)) * 0.3
    for method in ("taylor", "jacfwd"):
        E, dX, dB, hX = L.expm_derivatives(
            jnp.asarray(c), jnp.asarray(B), grad_X=True,
            grad_basis=True, hess_X=True, method=method)
        assert E.shape == (2, 5, 3, 3)
        assert dX.shape == (2, 5, 4, 3, 3)
        assert dB.shape == (2, 5, 4, 3, 3, 3, 3)
        assert hX.shape == (2, 5, 4, 4, 3, 3)


def test_meanm_batched_matches_single(rng):
    """Native leading-batch meanm (round 5 extension): G independent
    barycenters in one while_loop must match per-problem calls exactly
    (per-problem plateau/divergence masks, lane-parallel kernels)."""
    X = rng.standard_normal((3, 5, 4, 4)) * 0.2
    M = np.asarray(L.expm(jnp.asarray(X)))
    mb = np.asarray(L.meanm(jnp.asarray(M)))
    assert mb.shape == (3, 4, 4)
    for g in range(3):
        ms = np.asarray(L.meanm(jnp.asarray(M[g])))
        np.testing.assert_allclose(mb[g], ms, rtol=1e-12, atol=1e-14)


def test_meanm_batched_divergence_isolation(rng):
    """A diverging problem (singular projection -> NaN logm) freezes
    only itself; batch-mates converge to their barycenters."""
    import warnings as _w

    X = rng.standard_normal((2, 4, 4, 4)) * 0.2
    M = np.asarray(L.expm(jnp.asarray(X)))
    Mbad = M.copy()
    Mbad[1, 0] = 0.0  # singular member: lmdiv -> inf/NaN projection
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        mb = np.asarray(L.meanm(jnp.asarray(Mbad)))
        good = np.asarray(L.meanm(jnp.asarray(M[0])))
    np.testing.assert_allclose(mb[0], good, rtol=1e-12, atol=1e-14)
