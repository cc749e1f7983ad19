"""Property tests for the compact symmetric layout spec."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastmath_tpu.layouts import (
    MatrixLayout,
    classify_layout,
    compact_index_grid,
    compact_size,
    full_to_sym,
    sym_diag,
    sym_dim,
    sym_to_full,
    tri_index,
)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 16])
def test_pack_unpack_roundtrip(n, rng):
    full = rng.standard_normal((3, n, n))
    full = full + np.swapaxes(full, -1, -2)
    compact = full_to_sym(jnp.asarray(full))
    assert compact.shape == (3, compact_size(n))
    back = sym_to_full(compact)
    np.testing.assert_allclose(np.asarray(back), full, rtol=0, atol=0)


def test_layout_contract_3x3():
    # reference contract (sym.py:8-24): [[a,d,e],[d,b,f],[e,f,c]] -> [a,b,c,d,e,f]
    a, b, c, d, e, f = 1.0, 2.0, 3.0, 4.0, 5.0, 6.0
    full = jnp.array([[a, d, e], [d, b, f], [e, f, c]])
    compact = full_to_sym(full)
    np.testing.assert_array_equal(np.asarray(compact), [a, b, c, d, e, f])


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6])
def test_tri_index_matches_grid(n):
    grid = compact_index_grid(n)
    for i in range(n):
        for j in range(n):
            assert grid[i, j] == tri_index(i, j, n)
            assert grid[i, j] == grid[j, i]
    # diagonal occupies the first n slots in order
    assert [grid[i, i] for i in range(n)] == list(range(n))
    # all compact slots are hit
    assert sorted(set(grid.ravel().tolist())) == list(range(compact_size(n)))


def test_sym_dim():
    for n in range(1, 20):
        assert sym_dim(compact_size(n)) == n
    with pytest.raises(ValueError):
        sym_dim(5)


def test_classify_layout():
    assert classify_layout(1, 4) is MatrixLayout.SCALED_IDENTITY
    assert classify_layout(4, 4) is MatrixLayout.DIAGONAL
    assert classify_layout(10, 4) is MatrixLayout.COMPACT_SYM
    assert classify_layout(16, 4) is MatrixLayout.FULL
    # precedence: for n=1 everything collapses to scaled identity
    assert classify_layout(1, 1) is MatrixLayout.SCALED_IDENTITY
    # for n=2: 3 = compact, 4 = full, 2 = diag
    assert classify_layout(3, 2) is MatrixLayout.COMPACT_SYM
    assert classify_layout(4, 2) is MatrixLayout.FULL
    with pytest.raises(ValueError):
        classify_layout(7, 3)


def test_sym_diag(rng):
    full = rng.standard_normal((5, 4, 4))
    full = full + np.swapaxes(full, -1, -2)
    compact = full_to_sym(jnp.asarray(full))
    np.testing.assert_allclose(
        np.asarray(sym_diag(compact)),
        np.diagonal(full, axis1=-2, axis2=-1),
    )
