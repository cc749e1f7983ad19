"""Parity tests for DCT/DST vs scipy.fft, all types x norms x dims.

Mirrors the reference's test_realtransforms.py strategy (all 4
transforms x types (1,2,3) x norms x dims vs scipy), with the modern
scipy mapping: our 'ortho' == scipy ortho (orthogonalize=True), our
'ortho_scipy' == scipy ortho with orthogonalize=False (the legacy
convention the reference's 'ortho_scipy' replicates).
"""
import numpy as np
import pytest
import scipy.fft as sfft
import jax.numpy as jnp

import fastmath_tpu.ops.realtransforms as RT

FAMILIES = ["dct", "dst"]
TYPES = [1, 2, 3, 4]  # type 4 is this build's extension (reference raises)
NORMS = ["backward", "ortho", "forward", "ortho_scipy"]
DIMS = [-1, 0, 1]


def scipy_ref(fam, x, type, dim, norm, inverse=False):
    fn = getattr(sfft, ("i" if inverse else "") + fam)
    kw = dict(type=type, axis=dim)
    if norm == "ortho_scipy" and fam == "dst":
        # legacy scipy/cupy convention (reference's compat mode targets
        # DST only; for DCT ortho_scipy == ortho)
        kw.update(norm="ortho", orthogonalize=False)
    elif norm == "ortho_scipy":
        kw.update(norm="ortho")
    else:
        kw.update(norm=norm)
    return fn(x, **kw)


@pytest.mark.parametrize("fam", FAMILIES)
@pytest.mark.parametrize("type", TYPES)
@pytest.mark.parametrize("norm", NORMS)
@pytest.mark.parametrize("dim", DIMS)
def test_1d_parity(fam, type, norm, dim, rng):
    x = rng.standard_normal((5, 6, 7))
    ours = getattr(RT, fam)
    got = np.asarray(ours(jnp.asarray(x), dim=dim, norm=norm, type=type))
    want = scipy_ref(fam, x, type, dim, norm)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("fam", FAMILIES)
@pytest.mark.parametrize("type", TYPES)
@pytest.mark.parametrize("norm", NORMS)
def test_inverse_roundtrip(fam, type, norm, rng):
    x = rng.standard_normal((4, 9))
    fwd = getattr(RT, fam)
    inv = getattr(RT, "i" + fam)
    y = fwd(jnp.asarray(x), norm=norm, type=type)
    back = np.asarray(inv(y, norm=norm, type=type))
    np.testing.assert_allclose(back, x, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("fam", FAMILIES)
@pytest.mark.parametrize("type", TYPES)
def test_inverse_matches_scipy(fam, type, rng):
    x = rng.standard_normal((4, 9))
    for norm in ["backward", "ortho", "forward"]:
        inv = getattr(RT, "i" + fam)
        got = np.asarray(inv(jnp.asarray(x), norm=norm, type=type))
        want = scipy_ref(fam, x, type, -1, norm, inverse=True)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("fam", FAMILIES)
@pytest.mark.parametrize("dims", [None, (0, 1), (0, 2), (1,)])
def test_nd(fam, dims, rng):
    x = rng.standard_normal((4, 5, 6))
    ours = getattr(RT, fam + "n")
    got = np.asarray(ours(jnp.asarray(x), dim=dims, norm="ortho", type=2))
    fn = getattr(sfft, fam + "n")
    axes = dims if dims is not None else None
    want = fn(x, type=2, axes=axes, norm="ortho")
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    iours = getattr(RT, "i" + fam + "n")
    back = np.asarray(iours(jnp.asarray(got), dim=dims, norm="ortho", type=2))
    np.testing.assert_allclose(back, x, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("fam", FAMILIES)
@pytest.mark.parametrize("type", TYPES)
def test_fft_path_matches_matmul(fam, type, rng, monkeypatch):
    """The long-axis FFT path must agree with the MXU matmul path."""
    x = rng.standard_normal((3, 50))
    got_mm = np.asarray(getattr(RT, fam)(jnp.asarray(x), type=type))
    monkeypatch.setattr(RT, "MATMUL_MAX_N", 1)
    got_fft = np.asarray(getattr(RT, fam)(jnp.asarray(x), type=type))
    np.testing.assert_allclose(got_fft, got_mm, rtol=1e-9, atol=1e-10)


def test_invalid_type_raises():
    # type 4 is implemented here (extension over the reference, which
    # raises on it); anything outside 1-4 must still raise
    with pytest.raises(ValueError):
        RT.dct(jnp.zeros(4), type=5)
    with pytest.raises(ValueError):
        RT.dst(jnp.zeros(4), type=0)


def test_complex_input(rng):
    x = rng.standard_normal((3, 8)) + 1j * rng.standard_normal((3, 8))
    got = np.asarray(RT.dct(jnp.asarray(x), norm="ortho"))
    want = sfft.dct(x.real, norm="ortho") + 1j * sfft.dct(x.imag, norm="ortho")
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_int_promotion():
    x = jnp.arange(8)
    y = RT.dct(x)
    assert y.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(y), sfft.dct(np.arange(8.0)),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("fam", FAMILIES)
@pytest.mark.parametrize("type", TYPES)
@pytest.mark.parametrize("norm", NORMS)
def test_gradcheck(fam, type, norm, rng):
    """f64 gradient check for every transform/type/norm combo — mirrors
    the reference's only gradient tests (test_realtransforms_gradcheck)."""
    import jax

    x = jnp.asarray(rng.standard_normal((3, 6)))
    w = jnp.asarray(rng.standard_normal((3, 6)))
    fn = getattr(RT, fam)

    def loss(t):
        return jnp.sum(fn(t, norm=norm, type=type) * w)

    g = jax.grad(loss)(x)
    h = 1e-6
    for idx in [(0, 0), (1, 3), (2, 5)]:
        e = jnp.zeros_like(x).at[idx].set(h)
        fd = (loss(x + e) - loss(x - e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd),
                                   rtol=1e-5, atol=1e-8)


def test_large_n_matmul_path(rng):
    """n = 2048 stays on the basis-matmul path (measured faster than
    FFT through 4096 on TPU); parity vs scipy."""
    import scipy.fft as sfft
    from fastmath_tpu.ops import realtransforms as RT

    x = rng.standard_normal((4, 2048))
    got = np.asarray(RT.dct(jnp.asarray(x), norm="ortho"))
    want = sfft.dct(x, norm="ortho")
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)


def test_beyond_gate_fft_path(rng):
    """n just above the gate exercises the FFT path; parity vs scipy."""
    import scipy.fft as sfft
    from fastmath_tpu.ops import realtransforms as RT

    x = rng.standard_normal((2, 4100))
    got = np.asarray(RT.dct(jnp.asarray(x), norm="ortho"))
    want = sfft.dct(x, norm="ortho")
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("fam", FAMILIES)
def test_type4_fft_path_matches_matmul(fam, rng):
    """The odd-bin FFT pipeline (n > MATMUL_MAX_N) agrees with the
    basis-matmul definition (checked by shrinking the gate)."""
    x = rng.standard_normal((5, 96))
    ours = getattr(RT, fam)
    want = np.asarray(ours(jnp.asarray(x), norm="ortho", type=4))
    old = RT.MATMUL_MAX_N
    try:
        RT.MATMUL_MAX_N = 8
        got = np.asarray(ours(jnp.asarray(x), norm="ortho", type=4))
    finally:
        RT.MATMUL_MAX_N = old
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("fam", FAMILIES)
def test_type4_ortho_involutive(fam, rng):
    """DCT-IV/DST-IV with ortho norm are their own inverses."""
    x = rng.standard_normal((4, 33))
    ours = getattr(RT, fam)
    y = ours(jnp.asarray(x), norm="ortho", type=4)
    back = np.asarray(ours(y, norm="ortho", type=4))
    np.testing.assert_allclose(back, x, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("prec", ["highest", "high", "default"])
def test_precision_knob(prec, rng):
    """`precision=` (extension) selects the MXU pass precision of the
    basis-matmul path; on CPU all modes are exact f32, so this checks
    the plumbing (incl. idct/dctn threading) and that grads flow."""
    import jax

    x = rng.standard_normal((6, 32))
    want = np.asarray(RT.dct(jnp.asarray(x), norm="ortho"))
    got = np.asarray(RT.dct(jnp.asarray(x), norm="ortho", precision=prec))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    rt = np.asarray(RT.idct(RT.dct(jnp.asarray(x), precision=prec),
                            precision=prec))
    np.testing.assert_allclose(rt, x, rtol=1e-5, atol=1e-7)
    nd = np.asarray(RT.dctn(jnp.asarray(x), norm="ortho", precision=prec))
    want_nd = np.asarray(RT.dctn(jnp.asarray(x), norm="ortho"))
    np.testing.assert_allclose(nd, want_nd, rtol=1e-5, atol=1e-7)
    g = jax.grad(lambda t: jnp.sum(
        RT.dst(t, norm="ortho", precision=prec) ** 2))(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()
