"""Native-tier routing tests: the public sym/batched ops must serve the
Pallas kernels through ``backend=`` exactly like the reference's public
names ARE its jitfields kernels (reference ``sym.py:37``).

On the CPU test backend the kernels run in interpret mode, so
``backend="pallas"`` exercises the full routed path (lazy transpose +
block-major repack + kernel + inverse relayout) without TPU hardware;
``backend="auto"`` must pick XLA here (not a TPU). Parity is asserted
against the fused-XLA path and float64 numpy oracles.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmath_tpu.layouts import full_to_sym
from fastmath_tpu.ops import batched as B
from fastmath_tpu.ops import sym as S


def _spd(rng, b, n):
    a = rng.standard_normal((b, n, n))
    return np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6, 8])
def test_sym_solve_backends_agree(rng, n):
    spd = _spd(rng, 257, n)  # odd batch exercises pad-to-block
    c = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd))))
    v = jnp.asarray(rng.standard_normal((257, n)))
    want = np.linalg.solve(spd, np.asarray(v)[..., None])[..., 0]
    for be in ("xla", "pallas", "auto"):
        got = np.asarray(S.sym_solve(c, v, backend=be))
        assert np.abs(got - want).max() < 1e-9, be


@pytest.mark.parametrize("n", [3, 6, 8])
def test_sym_invert_det_backends_agree(rng, n):
    spd = _spd(rng, 100, n)
    c = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd))))
    ix = np.asarray(S.sym_invert(c, backend="xla"))
    ip = np.asarray(S.sym_invert(c, backend="pallas"))
    np.testing.assert_allclose(ip, ix, rtol=1e-9, atol=1e-11)
    dp = np.asarray(S.sym_invert(c, diag=True, backend="pallas"))
    np.testing.assert_allclose(dp, ip[..., :n], rtol=0, atol=0)
    det_p = np.asarray(S.sym_det(c, backend="pallas"))
    np.testing.assert_allclose(det_p, np.linalg.det(spd), rtol=1e-9)


def test_sym_elementwise_ops_pallas_override(rng):
    n = 6
    spd = _spd(rng, 64, n)
    c = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd))))
    v = jnp.asarray(rng.standard_normal((64, n)))
    acc = jnp.asarray(rng.standard_normal((64, n)))
    for fn, args in [
        (S.sym_matvec, (c, v)),
        (S.sym_addmatvec, (acc, c, v)),
        (S.sym_submatvec, (acc, c, v)),
        (S.sym_outer, (v,)),
    ]:
        np.testing.assert_allclose(
            np.asarray(fn(*args, backend="pallas")),
            np.asarray(fn(*args, backend="xla")),
            rtol=1e-12, atol=1e-12,
        )
    j = jnp.asarray(rng.standard_normal((64, 5, 4)))
    h5 = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(_spd(rng, 64, 5)))))
    np.testing.assert_allclose(
        np.asarray(S.sym_matmul(j, h5, backend="pallas")),
        np.asarray(S.sym_matmul(j, h5, backend="xla")),
        rtol=1e-9, atol=1e-11,
    )


def test_sym_solve_eps_refine_routed(rng):
    n = 6
    spd = _spd(rng, 64, n)
    c = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd))))
    v = jnp.asarray(rng.standard_normal((64, n)))
    o_p = np.asarray(S.sym_solve(c, v, eps=0.5, refine=2, backend="pallas"))
    o_x = np.asarray(S.sym_solve(c, v, eps=0.5, refine=2, backend="xla"))
    np.testing.assert_allclose(o_p, o_x, rtol=1e-9, atol=1e-11)
    want = np.linalg.solve(spd + 0.5 * np.eye(n), np.asarray(v)[..., None])
    np.testing.assert_allclose(o_p, want[..., 0], rtol=1e-9, atol=1e-11)


def test_sym_solve_routed_grad(rng):
    n = 6
    spd = _spd(rng, 32, n)
    c = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd))))
    v = jnp.asarray(rng.standard_normal((32, n)))

    def loss(be):
        return lambda c, v: jnp.sum(S.sym_solve(c, v, backend=be) ** 2)

    gp = jax.grad(loss("pallas"), argnums=(0, 1))(c, v)
    gx = jax.grad(loss("xla"), argnums=(0, 1))(c, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_sym_solve_routed_broadcasting(rng):
    n = 6
    spd = _spd(rng, 1, n)
    c = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd))))  # (1, NN)
    v = jnp.asarray(rng.standard_normal((2, 40, n)))  # extra leading dim
    got = np.asarray(S.sym_solve(c, v, backend="pallas"))
    want = np.asarray(S.sym_solve(c, v, backend="xla"))
    assert got.shape == (2, 40, n)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)


def test_backend_validation():
    c = jnp.ones((8, 6))  # 3x3 compact
    v = jnp.ones((8, 3))
    with pytest.raises(ValueError):
        S.sym_solve(c, v, backend="cuda")
    # pallas on an unsupported layout (diagonal) must raise, not fall back
    with pytest.raises(ValueError):
        S.sym_solve(jnp.ones((8, 3)), v, backend="pallas")
    # pallas beyond the kernel's N cap (32, the rolled tier) must raise
    big = jnp.ones((8, 33 * 34 // 2))
    with pytest.raises(ValueError):
        S.sym_solve(big, jnp.ones((8, 33)), backend="pallas")
    with pytest.raises(ValueError):
        B.batchinv(jnp.ones((8, 33, 33)), backend="pallas")
    with pytest.raises(ValueError):
        B.batchinv(jnp.ones((8, 3, 3)), regularize=True, backend="pallas")


@pytest.mark.parametrize("n", [2, 3, 4, 6, 8])
def test_batched_backends_agree(rng, n):
    spd = _spd(rng, 193, n)
    aj = jnp.asarray(spd)
    np.testing.assert_allclose(
        np.asarray(B.batchinv(aj, backend="pallas")),
        np.linalg.inv(spd), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(B.batchdet(aj, backend="pallas")),
        np.linalg.det(spd), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(B.batchchol(aj, backend="pallas")),
        np.linalg.cholesky(spd), rtol=1e-9, atol=1e-10)
    # general (non-SPD but invertible) matrices through the PLU kernel
    gen = spd + np.triu(np.ones((n, n)), 1) * 0.5
    np.testing.assert_allclose(
        np.asarray(B.batchinv(jnp.asarray(gen), backend="pallas")),
        np.linalg.inv(gen), rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("n", [3, 6, 8])
def test_batchlmdiv_backends_agree(rng, n):
    spd = _spd(rng, 150, n)
    aj = jnp.asarray(spd)
    bv = jnp.asarray(rng.standard_normal((150, n)))
    bm = jnp.asarray(rng.standard_normal((150, n, 3)))
    want_v = np.linalg.solve(spd, np.asarray(bv)[..., None])[..., 0]
    want_m = np.linalg.solve(spd, np.asarray(bm))
    for be in ("xla", "pallas", "auto"):
        np.testing.assert_allclose(
            np.asarray(B.batchlmdiv(aj, bv, backend=be)), want_v,
            rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(B.batchlmdiv(aj, bm, backend=be)), want_m,
            rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(B.batchrmdiv(jnp.swapaxes(bm, -1, -2), aj,
                                backend="pallas")),
        np.swapaxes(np.linalg.solve(np.swapaxes(spd, -1, -2),
                                    np.asarray(bm)), -1, -2),
        rtol=1e-8, atol=1e-9)


def test_batchlmdiv_routed_grad(rng):
    spd = _spd(rng, 32, 6)
    aj = jnp.asarray(spd)
    bv = jnp.asarray(rng.standard_normal((32, 6)))

    def loss(be):
        return lambda a, b: jnp.sum(B.batchlmdiv(a, b, backend=be) ** 2)

    gp = jax.grad(loss("pallas"), argnums=(0, 1))(aj, bv)
    gx = jax.grad(loss("xla"), argnums=(0, 1))(aj, bv)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


def test_batched_routed_grad(rng):
    spd = _spd(rng, 16, 6)
    aj = jnp.asarray(spd)

    def loss(be):
        return lambda a: jnp.sum(B.batchinv(a, backend=be) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss("pallas"))(aj)),
        np.asarray(jax.grad(loss("xla"))(aj)),
        rtol=1e-8, atol=1e-9)


def test_auto_is_xla_off_tpu(rng):
    """On the CPU test backend, auto must not take the Pallas branch
    (interpret-mode Pallas would silently slow everything down)."""
    assert jax.default_backend() != "tpu"
    from fastmath_tpu.ops._routing import use_pallas

    assert not use_pallas("auto", supported=True, batch=10**9,
                          dtype=jnp.float32)
    assert use_pallas("pallas", supported=True, batch=1, dtype=jnp.float64)


def test_min_batch_gates():
    """The documented auto thresholds (BENCH-derived): 5<=N<=8 routes
    from 4096 lanes; N<=4 only from 8M (fused XLA chains better)."""
    from fastmath_tpu.ops import _routing as R

    assert R.MIN_BATCH == 4096
    assert R.MIN_BATCH_SMALL_N == 8_000_000
