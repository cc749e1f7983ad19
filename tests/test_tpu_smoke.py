"""Hardware smoke set: one parity test per Pallas kernel family.

Runs on any backend (CPU CI exercises interpret mode), but its purpose
is the recorded **real-TPU pass** (VERDICT r2 item 5):

    FASTMATH_TEST_PLATFORM=axon python -m pytest tests/test_tpu_smoke.py -q

Each test is one small-batch parity assertion against a float64 numpy
oracle through the kernel's *public routed entry* where one exists —
small batches keep the on-chip run to compile time (~1 s per kernel
after the first; a fresh process pays the remote-compile warmup).
f32 tolerances; results recorded in CHANGELOG.md.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.layouts import full_to_sym
from fastmath_tpu.ops import batched as B
from fastmath_tpu.ops import lie as L
from fastmath_tpu.ops import qr as Q
from fastmath_tpu.ops import sym as S

_B = 1024  # multiple of 128 (no pad edge on chip; pad is covered on CPU)


def _spd(rng, b, n):
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    return np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(
        n, dtype=np.float32)


def _compact(full):
    return jnp.asarray(np.asarray(full_to_sym(jnp.asarray(full))))


def _skip_big_on_cpu(n):
    # n > 16 interpret runs at _B = 1024 cost minutes on the 1-core CI
    # VM; CPU coverage of the 17..32 tier lives in test_rolled32.py
    # (B = 192) — here the point is the hardware Mosaic lowering
    if n > 16 and jax.default_backend() != "tpu":
        pytest.skip("n>16 smoke is TPU-only (CPU: test_rolled32.py)")


@pytest.mark.parametrize("n", [4, 8, 24])
def test_smoke_sym_solve_pallas(rng, n):
    _skip_big_on_cpu(n)
    spd = _spd(rng, _B, n)
    v = rng.standard_normal((_B, n)).astype(np.float32)
    got = np.asarray(
        S.sym_solve(_compact(spd), jnp.asarray(v), backend="pallas"),
        np.float64)
    want = np.linalg.solve(spd.astype(np.float64),
                           v.astype(np.float64)[..., None])[..., 0]
    nw = np.linalg.norm(got - want, axis=-1) / np.linalg.norm(want, axis=-1)
    assert nw.max() < 1e-5


@pytest.mark.parametrize("n", [4, 16])
def test_smoke_sym_solve_chain_pallas(rng, n):
    """Fused-iteration chain kernel, adjugate (n<=4) and rolled-PLU
    (9<=n<=16) tiers."""
    k = 4
    spd = _spd(rng, _B, n)
    v = rng.standard_normal((_B, n)).astype(np.float32)
    ad = rng.standard_normal((_B, n)).astype(np.float32)
    got = np.asarray(
        S.sym_solve_chain(_compact(spd), jnp.asarray(v), k,
                          add=jnp.asarray(ad), backend="pallas"),
        np.float64)
    xo = v.astype(np.float64)
    a64 = spd.astype(np.float64)
    for _ in range(k):
        xo = np.linalg.solve(a64, xo[..., None])[..., 0] + ad
    nw = np.linalg.norm(got - xo, axis=-1) / np.linalg.norm(xo, axis=-1)
    assert nw.max() < 1e-5


def test_smoke_sym_invert_pallas(rng):
    spd = _spd(rng, _B, 6)
    got = np.asarray(S.sym_invert(_compact(spd), backend="pallas"))
    want = np.asarray(full_to_sym(jnp.asarray(
        np.linalg.inv(spd.astype(np.float64)))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("n", [8, 20])
def test_smoke_batchinv_pallas(rng, n):
    _skip_big_on_cpu(n)
    spd = _spd(rng, _B, n)
    got = np.asarray(B.batchinv(jnp.asarray(spd), backend="pallas"),
                     np.float64)
    want = np.linalg.inv(spd.astype(np.float64))
    nw = (np.linalg.norm(got - want, axis=(-2, -1))
          / np.linalg.norm(want, axis=(-2, -1)))
    assert nw.max() < 1e-5


@pytest.mark.parametrize("n", [6, 24])
def test_smoke_batchchol_pallas(rng, n):
    _skip_big_on_cpu(n)
    spd = _spd(rng, _B, n)
    got = np.asarray(B.batchchol(jnp.asarray(spd), backend="pallas"),
                     np.float64)
    want = np.linalg.cholesky(spd.astype(np.float64))
    nw = (np.linalg.norm(got - want, axis=(-2, -1))
          / np.linalg.norm(want, axis=(-2, -1)))
    assert nw.max() < 1e-5


def test_smoke_eig_pallas(rng):
    spd = _spd(rng, _B, 4)
    w = np.sort(np.asarray(Q.eig_sym(jnp.asarray(spd), check_finite=False,
                                     backend="pallas")), -1)
    ww = np.sort(np.linalg.eigvalsh(spd.astype(np.float64)), -1)
    assert np.abs(w - ww).max() / np.abs(ww).max() < 1e-5


@pytest.mark.parametrize("n", [16, 24])
def test_smoke_eig16_pallas(rng, n):
    """Rolled parallel-order Jacobi tier (9 <= n <= 32)."""
    _skip_big_on_cpu(n)
    spd = _spd(rng, _B, n)
    w = np.sort(np.asarray(Q.eig_sym(jnp.asarray(spd), check_finite=False,
                                     backend="pallas")), -1)
    ww = np.sort(np.linalg.eigvalsh(spd.astype(np.float64)), -1)
    assert np.abs(w - ww).max() / np.abs(ww).max() < 1e-5


@pytest.mark.parametrize("d", [4, 8, 16])
def test_smoke_expm_logm_pallas(rng, d):
    # d = 4: adjugate register-inverse tier; d = 8: in-kernel PLU tier;
    # d = 16: rolled stacked-grid tier (d >= 6 logm is TPU-only
    # coverage — interpret mode costs minutes)
    if d > 4 and jax.default_backend() != "tpu":
        pytest.skip("d>=6 eager interpret loops cost minutes on CPU")
    X = (rng.standard_normal((_B, d, d)) * 0.4).astype(np.float32)
    # on TPU these route through the expm/logm register kernels
    E = L.expm(jnp.asarray(X))
    back = np.asarray(L.logm(E))
    rel = np.abs(back - X) / (np.abs(X) + 1e-30)
    assert np.median(rel) < 1e-5 and np.quantile(rel, 0.99) < 5e-4
    # drive the logm KERNEL directly too: the public op's exceptional
    # rescue recomputes NaN'd lanes on the XLA path, which would mask a
    # broken Mosaic lowering of the kernel tier (off-cut inputs here
    # must come back finite from the kernel itself)
    from fastmath_tpu.kernels.logm_pallas import logm_cf

    cf = jnp.moveaxis(jnp.reshape(E, (-1, d * d)), 0, -1)
    kb = np.asarray(jnp.moveaxis(logm_cf(cf), -1, 0)).reshape(-1, d, d)
    assert np.isfinite(kb).all(), "kernel tier NaN'd (rescue would hide it)"
    relk = np.abs(kb - X) / (np.abs(X) + 1e-30)
    assert np.median(relk) < 1e-5


@pytest.mark.parametrize("kd", [(5, 4), (24, 16)])
def test_smoke_jhj_pallas(rng, kd):
    k, d = kd
    _skip_big_on_cpu(k)
    j = rng.standard_normal((_B, k, d)).astype(np.float32)
    h = _spd(rng, _B, k)
    got = np.asarray(S.sym_matmul(jnp.asarray(j), _compact(h),
                                  backend="pallas"), np.float64)
    want64 = np.einsum("...ki,...kl,...lj->...ij", j.astype(np.float64),
                       h.astype(np.float64), j.astype(np.float64))
    want = np.asarray(full_to_sym(jnp.asarray(want64)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_smoke_backend_report():
    """Record which backend this smoke pass actually ran on (shows in
    the -v output / CHANGELOG evidence)."""
    print(f"\n[smoke] backend={jax.default_backend()} "
          f"devices={jax.devices()}", flush=True)
    assert jax.default_backend() in ("tpu", "cpu")


@pytest.mark.parametrize("n", [6, 12, 24])
def test_smoke_sym_maxeig_pallas(rng, n):
    """Fused power-iteration kernel (dominant eigenpair) — unrolled
    (n <= 8) and rolled stacked-grid (9 <= n <= 32) tiers. The planted
    rank-1 spike keeps the eigen-gap large so 64 iterations converge
    to the max-gate on every lane."""
    _skip_big_on_cpu(n)
    spd = _spd(rng, _B, n)
    u = rng.standard_normal((_B, n)).astype(np.float32)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    spd = spd + 8.0 * n * np.einsum("bi,bj->bij", u, u).astype(np.float32)
    mu = np.asarray(
        S.sym_maxeig(_compact(spd), iters=64, backend="pallas"), np.float64)
    w = np.linalg.eigvalsh(spd.astype(np.float64))
    dom = w[np.arange(_B), np.argmax(np.abs(w), axis=-1)]
    rel = np.abs(mu - dom) / np.abs(dom)
    assert rel.max() < 1e-4


@pytest.mark.parametrize("n", [4, 12, 24])
def test_smoke_sym_matvec_chain_pallas(rng, n):
    """Fused Richardson/Neumann matvec chain kernel — unrolled and
    rolled stacked-grid tiers."""
    _skip_big_on_cpu(n)
    k = 8
    a = rng.standard_normal((_B, n, n)).astype(np.float32)
    A = ((a + a.swapaxes(-1, -2)) / (6 * n)).astype(np.float32)
    v = rng.standard_normal((_B, n)).astype(np.float32)
    got = np.asarray(
        S.sym_matvec_chain(_compact(A), jnp.asarray(v), k,
                           add=jnp.asarray(v), backend="pallas"),
        np.float64)
    x = v.astype(np.float64)
    for _ in range(k):
        x = np.einsum("bij,bj->bi", A.astype(np.float64), x) + v
    nw = np.linalg.norm(got - x, axis=-1) / np.linalg.norm(x, axis=-1)
    assert nw.max() < 1e-5
