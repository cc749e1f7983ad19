"""Parity tests for NaN-omitting reductions vs numpy oracles.

(The reference shipped no reduce tests at all — SURVEY.md §4 coverage
gaps — so these are oracle tests against numpy's nan* family.)
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fastmath_tpu.ops import reduce as R


def laced(rng, shape, frac=0.25):
    x = rng.standard_normal(shape)
    mask = rng.random(shape) < frac
    x[mask] = np.nan
    return x


DIMS = [None, 0, -1, (0, 1), (0, 2), (1, 2), (0, 1, 2)]


@pytest.mark.parametrize("dim", DIMS)
@pytest.mark.parametrize("keepdim", [False, True])
def test_nansum_nanmean(dim, keepdim, rng):
    x = laced(rng, (4, 5, 6))
    kw = {} if dim is None else {"axis": dim}
    if dim is None and keepdim:
        pytest.skip("keepdim meaningless for full reduction in reference API")
    got = np.asarray(R.nansum(jnp.asarray(x), dim=dim, keepdim=keepdim))
    want = np.nansum(x, keepdims=keepdim if dim is not None else False, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    got = np.asarray(R.nanmean(jnp.asarray(x), dim=dim, keepdim=keepdim))
    want = np.nanmean(x, keepdims=keepdim if dim is not None else False, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("dim", [0, -1, (0, 2), (1, 2)])
@pytest.mark.parametrize("kind", ["max", "min"])
def test_nanminmax_values(dim, kind, rng):
    x = laced(rng, (4, 5, 6))
    fn = getattr(R, f"nan{kind}")
    npfn = getattr(np, f"nan{kind}")
    got = np.asarray(fn(jnp.asarray(x), dim=dim))
    want = npfn(x, axis=dim)
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("kind", ["max", "min"])
def test_minmax_propagates_nan_by_default(kind, rng):
    x = laced(rng, (3, 4))
    fn = getattr(R, kind)
    got = np.asarray(fn(jnp.asarray(x), dim=1))
    want = getattr(np, kind)(x, axis=1)  # propagates NaN
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got[~np.isnan(got)], want[~np.isnan(want)])


@pytest.mark.parametrize("dim", [1, (1, 2), (0, 2)])
@pytest.mark.parametrize("keepdim", [False, True])
def test_return_indices(dim, keepdim, rng):
    x = rng.standard_normal((4, 5, 6))
    val, idx = R.max(jnp.asarray(x), dim=dim, keepdim=keepdim, return_indices=True)
    val, idx = np.asarray(val), np.asarray(idx)
    axes = (dim,) if isinstance(dim, int) else dim
    # verify indices point at the max values
    it = np.ndindex(*val.shape) if not keepdim else np.ndindex(
        *[s for d, s in enumerate(x.shape) if d not in [a % x.ndim for a in axes]]
    )
    # reconstruct: for each output position, index into x
    if keepdim:
        val_s = val.squeeze(tuple(a % x.ndim for a in axes))
        idx_s = idx.reshape(val_s.shape + ((len(axes),) if not isinstance(dim, int) else ()))
    else:
        val_s, idx_s = val, idx
    kept = [d for d in range(x.ndim) if d not in [a % x.ndim for a in axes]]
    red = [a % x.ndim for a in axes]
    for pos in np.ndindex(*val_s.shape):
        sub = idx_s[pos] if not isinstance(dim, int) else [idx_s[pos]]
        full_idx = [0] * x.ndim
        for d, p in zip(kept, pos):
            full_idx[d] = p
        for d, p in zip(red, np.atleast_1d(sub)):
            full_idx[d] = p
        assert x[tuple(full_idx)] == val_s[pos]


@pytest.mark.parametrize("dim", [0, 1, (0, 1)])
def test_median(dim, rng):
    x = rng.standard_normal((7, 9, 3))
    got = np.asarray(R.median(jnp.asarray(x), dim=dim))
    axes = (dim,) if isinstance(dim, int) else dim
    # lower-median oracle: sort and take element (n-1)//2
    xt = np.moveaxis(x, axes, tuple(range(-len(axes), 0)))
    xt = xt.reshape(xt.shape[: x.ndim - len(axes)] + (-1,))
    s = np.sort(xt, axis=-1)
    want = s[..., (s.shape[-1] - 1) // 2]
    np.testing.assert_allclose(got, want)


def test_median_omits_nan(rng):
    x = np.array([[1.0, np.nan, 3.0, 2.0], [np.nan, np.nan, np.nan, np.nan]])
    got = np.asarray(R.median(jnp.asarray(x), dim=1))
    assert got[0] == 2.0  # lower median of [1,2,3]
    assert np.isnan(got[1])  # all-NaN slice


def test_median_indices(rng):
    x = rng.standard_normal((5, 8))
    val, idx = R.median(jnp.asarray(x), dim=1, return_indices=True)
    val, idx = np.asarray(val), np.asarray(idx)
    for i in range(5):
        assert x[i, idx[i]] == val[i]


@pytest.mark.parametrize("unbiased", [False, True])
@pytest.mark.parametrize("dim", [0, (0, 1)])
def test_nanvar_nanstd(unbiased, dim, rng):
    x = laced(rng, (6, 7, 8), frac=0.2)
    ddof = 1 if unbiased else 0
    got = np.asarray(R.nanvar(jnp.asarray(x), dim=dim, unbiased=unbiased))
    want = np.nanvar(x, axis=dim, ddof=ddof)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    got = np.asarray(R.nanstd(jnp.asarray(x), dim=dim, unbiased=unbiased))
    np.testing.assert_allclose(got, np.sqrt(want), rtol=1e-10)


@pytest.mark.parametrize("unbiased", [False, True])
def test_var_std(unbiased, rng):
    x = rng.standard_normal((6, 7))
    ddof = 1 if unbiased else 0
    got = np.asarray(R.var(jnp.asarray(x), dim=1, unbiased=unbiased))
    np.testing.assert_allclose(got, np.var(x, axis=1, ddof=ddof), rtol=1e-10)
    got = np.asarray(R.std(jnp.asarray(x), dim=1, unbiased=unbiased))
    np.testing.assert_allclose(got, np.std(x, axis=1, ddof=ddof), rtol=1e-10)


def test_grad_safe_nansum(rng):
    import jax

    x = laced(rng, (4, 5), frac=0.3)
    g = jax.grad(lambda t: R.nansum(t))(jnp.asarray(x))
    g = np.asarray(g)
    # gradient is 1 where non-NaN, 0 at NaN positions (grad-safe masking,
    # reference needed a special branch at reduce.py:505-509)
    np.testing.assert_array_equal(g[~np.isnan(x)], 1.0)
    np.testing.assert_array_equal(g[np.isnan(x)], 0.0)


def test_integer_input():
    x = jnp.arange(12).reshape(3, 4)
    assert int(R.sum(x)) == 66
    assert int(R.median(x, dim=None)) == 5  # lower median of 0..11
    v, i = R.max(x, dim=1, return_indices=True)
    np.testing.assert_array_equal(np.asarray(v), [3, 7, 11])
    np.testing.assert_array_equal(np.asarray(i), [3, 3, 3])
