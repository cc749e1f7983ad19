"""bf16/f16 dtype contract for the linalg tier (VERDICT r1 item 7):
public sym/batched/eig ops upcast half-precision inputs to f32
internally and round once on output — same contract as
``ops.special._upcast`` (BASELINE configs[3] extended to configs[0/2]).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fastmath_tpu.kernels import sym_solve_cf
from fastmath_tpu.layouts import full_to_sym
from fastmath_tpu.ops import batched as B
from fastmath_tpu.ops import qr as Q
from fastmath_tpu.ops import sym as S

HALF_DTYPES = [jnp.bfloat16, jnp.float16]


def spd_batch(rng, b, n):
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    spd = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(
        n, dtype=np.float32
    )
    return spd


def rel_err(got, want):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    scale = np.maximum(np.abs(want), 1.0)
    return np.max(np.abs(got - want) / scale)


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_sym_solve_bf16(dtype, rng):
    spd = spd_batch(rng, 64, 4)
    vec = rng.standard_normal((64, 4)).astype(np.float32)
    mat = np.asarray(full_to_sym(jnp.asarray(spd)))
    mh = jnp.asarray(mat).astype(dtype)
    vh = jnp.asarray(vec).astype(dtype)
    out = S.sym_solve(mh, vh)
    assert out.dtype == jnp.dtype(dtype)
    # oracle: f32 solve of the half-rounded inputs (isolates the
    # *compute* contract from the input rounding)
    want = np.asarray(
        S.sym_solve(mh.astype(jnp.float32), vh.astype(jnp.float32))
    )
    assert rel_err(out, want) < 0.02


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_sym_matvec_bf16(dtype, rng):
    spd = spd_batch(rng, 32, 3)
    vec = rng.standard_normal((32, 3)).astype(np.float32)
    mat = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd)))).astype(dtype)
    v = jnp.asarray(vec).astype(dtype)
    out = S.sym_matvec(mat, v)
    assert out.dtype == jnp.dtype(dtype)
    want = np.asarray(
        S.sym_matvec(mat.astype(jnp.float32), v.astype(jnp.float32))
    )
    assert rel_err(out, want) < 0.02


@pytest.mark.parametrize("dtype", HALF_DTYPES)
@pytest.mark.parametrize("n", [3, 6])
def test_batchinv_bf16(dtype, n, rng):
    spd = spd_batch(rng, 48, n)
    a = jnp.asarray(spd).astype(dtype)
    out = B.batchinv(a)
    assert out.dtype == jnp.dtype(dtype)
    want = np.asarray(B.batchinv(a.astype(jnp.float32)))
    assert rel_err(out, want) < 0.03


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_batchchol_logdet_bf16(dtype, rng):
    spd = spd_batch(rng, 32, 5)
    a = jnp.asarray(spd).astype(dtype)
    L = B.batchchol(a)
    ld = B.batchlogdet(a)
    assert L.dtype == jnp.dtype(dtype) and ld.dtype == jnp.dtype(dtype)
    want_l = np.asarray(B.batchchol(a.astype(jnp.float32)))
    want_d = np.asarray(B.batchlogdet(a.astype(jnp.float32)))
    assert rel_err(L, want_l) < 0.03
    assert rel_err(ld, want_d) < 0.03


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_eig_sym_bf16(dtype, rng):
    a = rng.standard_normal((24, 4, 4)).astype(np.float32)
    a = a + np.swapaxes(a, -1, -2)
    ah = jnp.asarray(a).astype(dtype)
    w = Q.eig_sym(ah)
    assert w.dtype == jnp.dtype(dtype)
    want = np.sort(
        np.asarray(Q.eig_sym(ah.astype(jnp.float32))), axis=-1
    )
    assert rel_err(np.sort(np.asarray(w), -1), want) < 0.02
    w2, u = Q.eig_sym(ah, compute_u=True)
    assert w2.dtype == jnp.dtype(dtype) and u.dtype == jnp.dtype(dtype)


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_sym_solve_cf_bf16(dtype, rng):
    """Channel-first Pallas wrapper: half inputs compute in f32 (the
    bf16 (16, 128) tiling breaks the lane-packed layout — CLAUDE.md)."""
    spd = spd_batch(rng, 96, 4)
    vec = rng.standard_normal((96, 4)).astype(np.float32)
    mat_cf = np.ascontiguousarray(
        np.asarray(full_to_sym(jnp.asarray(spd))).T
    )
    mh = jnp.asarray(mat_cf).astype(dtype)
    vh = jnp.asarray(vec.T).astype(dtype)
    out = sym_solve_cf(mh, vh, block=256)
    assert out.dtype == jnp.dtype(dtype)
    want = np.asarray(
        sym_solve_cf(mh.astype(jnp.float32), vh.astype(jnp.float32),
                     block=256)
    )
    assert rel_err(out, want) < 0.02


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_batchmatmul_det_bf16(dtype, rng):
    a = rng.standard_normal((16, 4, 4)).astype(np.float32)
    b = rng.standard_normal((16, 4, 4)).astype(np.float32)
    ah, bh = jnp.asarray(a).astype(dtype), jnp.asarray(b).astype(dtype)
    mm = B.batchmatmul(ah, bh)
    dt = B.batchdet(ah)
    assert mm.dtype == jnp.dtype(dtype) and dt.dtype == jnp.dtype(dtype)
    want_mm = np.asarray(
        B.batchmatmul(ah.astype(jnp.float32), bh.astype(jnp.float32))
    )
    assert rel_err(mm, want_mm) < 0.02


def test_mixed_precision_promotes_not_downcasts(rng):
    """Mixed half/full inputs follow JAX promotion: an f32/f64 operand
    is never silently rounded to half (code-review r2 finding #1)."""
    mat = jnp.asarray(rng.standard_normal((8, 10)).astype(np.float32))
    vec = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    out = S.sym_matvec(mat, vec.astype(jnp.bfloat16))
    assert out.dtype == jnp.float32
    # f64 accumulator + bf16 operands keeps the f64 accumulator dtype
    acc = jnp.asarray(rng.standard_normal((8, 4)))  # f64 under x64
    out = S.sym_addmatvec(acc, mat.astype(jnp.bfloat16),
                          vec.astype(jnp.bfloat16))
    assert out.dtype == acc.dtype
    a = jnp.asarray(rng.standard_normal((8, 4, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8, 4, 4))).astype(jnp.bfloat16)
    assert B.batchmatmul(a, b).dtype == jnp.float32


@pytest.mark.parametrize("n", [6, 10])
def test_batched_integer_inputs(n, rng):
    """Integer matrices promote to float (previously: silent truncation
    in the unrolled tier, scan-carry crash in the rolled tier)."""
    a = rng.integers(-4, 5, (20, n, n)).astype(np.int64)
    a = a + n * 4 * np.eye(n, dtype=np.int64)
    det = np.asarray(B.batchdet(jnp.asarray(a)))
    np.testing.assert_allclose(det, np.linalg.det(a.astype(np.float64)),
                               rtol=1e-9)
    inv = np.asarray(B.batchinv(jnp.asarray(a)))
    np.testing.assert_allclose(inv, np.linalg.inv(a.astype(np.float64)),
                               rtol=1e-8, atol=1e-10)
