"""NaN-omitting multi-dim reductions with keepdim / return_indices.

Capability parity with the reference's ``reduce`` module
(``nitorch_fastmath/reduce.py``): ``min/max/nanmin/nanmax/median/sum/
nansum/mean/nanmean/var/nanvar/std/nanstd`` with the uniform API

``fn(input, dim=None, keepdim=False, omitnan=False, inplace=False,
out=None)`` (+ ``return_indices`` for the picking reductions, +
``unbiased``/``dtype`` for moments).

TPU-first design notes:

* Values reduce with native multi-axis XLA reductions (no
  movedim+collapse needed — the reference collapses because torch's
  reducers are single-dim, ``reduce.py:112-127``).
* ``return_indices`` uses the collapse-to-flat-argmax path and converts
  flat -> multi indices with :func:`fastmath_tpu.core.ind2sub` (reference
  ``reduce.py:127-140``); indices come back stacked in the **last** axis
  with shape ``(..., len(dim))``, dropped for scalar ``dim``.
* NaN handling is masked ``jnp.where`` (grad-safe by construction; the
  reference needs an explicit autograd-safe branch, ``reduce.py:505-509``).
* ``inplace``/``out`` are accepted for API compatibility and ignored:
  JAX is functional; donation + XLA fusion subsume them.

Known, deliberate divergence: the reference's ``nanvar`` computes
``E[x^2] - E[x]`` (missing the square, ``reduce.py:678-681``); this
implementation uses the correct ``E[x^2] - E[x]^2`` (see SURVEY.md
appendix).

``median`` always omits NaNs (reference contract ``reduce.py:403-404``)
and returns the *lower* median, matching ``torch.median``; all-NaN
slices yield NaN.
"""
from __future__ import annotations

import builtins
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.shapes import ensure_tuple, ind2sub

__all__ = [
    "min",
    "max",
    "nanmin",
    "nanmax",
    "median",
    "sum",
    "nansum",
    "mean",
    "nanmean",
    "var",
    "nanvar",
    "std",
    "nanstd",
]


def _canon_axes(dim, ndim):
    scalar = not isinstance(dim, (list, tuple, np.ndarray))
    axes = tuple(d if d >= 0 else ndim + d for d in ensure_tuple(dim))
    for d in axes:
        if not 0 <= d < ndim:
            raise ValueError(f"dim {d} out of range for ndim {ndim}")
    return axes, scalar


def _collapse_last(x, axes):
    """Move ``axes`` to the end and collapse them into one axis; returns
    (collapsed, subshape, keptshape, redshape)."""
    ndim = x.ndim
    keep = tuple(d for d in range(ndim) if d not in axes)
    subshape = tuple(x.shape[d] for d in keep)
    keptshape = tuple(1 if d in axes else x.shape[d] for d in range(ndim))
    redshape = tuple(x.shape[d] for d in axes)
    x = jnp.transpose(x, keep + axes)
    x = x.reshape(subshape + (-1,))
    return x, subshape, keptshape, redshape


def _pick_reduce(x, dim, keepdim, return_indices, kind):
    """Shared machinery for min/max picking reductions (post NaN masking)."""
    if dim is None:
        return (jnp.min if kind == "min" else jnp.max)(x)
    axes, scalar = _canon_axes(dim, x.ndim)
    if not return_indices:
        red = (jnp.min if kind == "min" else jnp.max)(x, axis=axes, keepdims=keepdim)
        return red
    xc, subshape, keptshape, redshape = _collapse_last(x, axes)
    if kind == "min":
        flat_idx = jnp.argmin(xc, axis=-1)
    else:
        flat_idx = jnp.argmax(xc, axis=-1)
    val = jnp.take_along_axis(xc, flat_idx[..., None], axis=-1)[..., 0]
    idx = ind2sub(flat_idx, redshape)  # (len(dim), *subshape)
    idx = jnp.moveaxis(idx, 0, -1)  # (*subshape, len(dim))
    if keepdim:
        val = val.reshape(keptshape)
        idx = idx.reshape(keptshape + (len(axes),))
    if scalar:
        idx = idx[..., 0]
    return val, idx


def max(
    input,
    dim=None,
    keepdim: bool = False,
    omitnan: bool = False,
    inplace: bool = False,
    return_indices: bool = False,
    out=None,
):
    """Multi-dim max; ``omitnan`` masks NaNs to -inf first.

    Reference analog: ``reduce.py:145-199`` (+ ``_nanmax:255``).
    """
    x = jnp.asarray(input)
    if omitnan and jnp.issubdtype(x.dtype, jnp.floating):
        x = jnp.where(jnp.isnan(x), -jnp.inf, x)
    return _pick_reduce(x, dim, keepdim, return_indices, "max")


def min(
    input,
    dim=None,
    keepdim: bool = False,
    omitnan: bool = False,
    inplace: bool = False,
    return_indices: bool = False,
    out=None,
):
    """Multi-dim min; ``omitnan`` masks NaNs to +inf first.

    Reference analog: ``reduce.py:200-254`` (+ ``_nanmin:319``).
    """
    x = jnp.asarray(input)
    if omitnan and jnp.issubdtype(x.dtype, jnp.floating):
        x = jnp.where(jnp.isnan(x), jnp.inf, x)
    return _pick_reduce(x, dim, keepdim, return_indices, "min")


def nanmax(input, dim=None, keepdim=False, inplace=False,
           return_indices=False, out=None):
    """``max(..., omitnan=True)`` (reference ``reduce.py:267``)."""
    return max(input, dim=dim, keepdim=keepdim, omitnan=True,
               return_indices=return_indices)


def nanmin(input, dim=None, keepdim=False, inplace=False,
           return_indices=False, out=None):
    """``min(..., omitnan=True)`` (reference ``reduce.py:331``)."""
    return min(input, dim=dim, keepdim=keepdim, omitnan=True,
               return_indices=return_indices)


def median(
    input,
    dim=None,
    keepdim: bool = False,
    omitnan: bool = False,
    inplace: bool = False,
    return_indices: bool = False,
    out=None,
):
    """Multi-dim lower median. **Always** omits NaNs (reference contract
    ``reduce.py:403-404``); all-NaN slices return NaN.

    Reference analog: ``reduce.py:384-430``.
    """
    x = jnp.asarray(input)
    isfloat = jnp.issubdtype(x.dtype, jnp.floating)
    if dim is None:
        flat = x.reshape(-1)
        if isfloat:
            valid = ~jnp.isnan(flat)
            cnt = jnp.sum(valid)
            flat = jnp.where(valid, flat, jnp.inf)
        else:
            cnt = flat.size
        s = jnp.sort(flat)
        k = jnp.maximum(cnt - 1, 0) // 2
        val = s[k]
        if isfloat:
            val = jnp.where(cnt == 0, jnp.nan, val)
        return val
    axes, scalar = _canon_axes(dim, x.ndim)
    xc, subshape, keptshape, redshape = _collapse_last(x, axes)
    if isfloat:
        valid = ~jnp.isnan(xc)
        cnt = jnp.sum(valid, axis=-1)
        xm = jnp.where(valid, xc, jnp.inf)
    else:
        cnt = jnp.full(xc.shape[:-1], xc.shape[-1], dtype=jnp.int32)
        xm = xc
    order = jnp.argsort(xm, axis=-1)
    k = jnp.maximum(cnt - 1, 0) // 2
    flat_idx = jnp.take_along_axis(order, k[..., None].astype(order.dtype), axis=-1)
    val = jnp.take_along_axis(xc, flat_idx, axis=-1)[..., 0]
    flat_idx = flat_idx[..., 0]
    if isfloat:
        val = jnp.where(cnt == 0, jnp.nan, val)
    if keepdim:
        val = val.reshape(keptshape)
    if return_indices:
        idx = jnp.moveaxis(ind2sub(flat_idx, redshape), 0, -1)
        if keepdim:
            idx = idx.reshape(keptshape + (len(axes),))
        if scalar:
            idx = idx[..., 0]
        return val, idx
    return val


def _axes_or_none(dim, ndim):
    if dim is None:
        return None, True
    axes, scalar = _canon_axes(dim, ndim)
    return axes, scalar


def sum(
    input,
    dim=None,
    keepdim: bool = False,
    omitnan: bool = False,
    inplace: bool = False,
    dtype=None,
    out=None,
):
    """Multi-dim sum; ``omitnan`` treats NaN as 0 (reference
    ``reduce.py:431-470``)."""
    x = jnp.asarray(input)
    if omitnan and jnp.issubdtype(x.dtype, jnp.floating):
        x = jnp.where(jnp.isnan(x), jnp.zeros((), x.dtype), x)
    axes, _ = _axes_or_none(dim, x.ndim)
    return jnp.sum(x, axis=axes, keepdims=keepdim, dtype=dtype)


def nansum(input, dim=None, keepdim=False, inplace=False, dtype=None, out=None):
    """``sum(..., omitnan=True)`` (reference ``reduce.py:471-511``)."""
    return sum(input, dim=dim, keepdim=keepdim, omitnan=True, dtype=dtype)


def mean(
    input,
    dim=None,
    keepdim: bool = False,
    omitnan: bool = False,
    inplace: bool = False,
    dtype=None,
    out=None,
):
    """Multi-dim mean; ``omitnan`` divides by the non-NaN count
    (reference ``reduce.py:513-596``)."""
    x = jnp.asarray(input)
    axes, _ = _axes_or_none(dim, x.ndim)
    if omitnan and jnp.issubdtype(x.dtype, jnp.floating):
        isnan = jnp.isnan(x)
        num = jnp.sum(jnp.where(isnan, jnp.zeros((), x.dtype), x),
                      axis=axes, keepdims=keepdim, dtype=dtype)
        den = jnp.sum(~isnan, axis=axes, keepdims=keepdim).astype(num.dtype)
        return num / den
    return jnp.mean(x, axis=axes, keepdims=keepdim, dtype=dtype)


def nanmean(input, dim=None, keepdim=False, inplace=False, dtype=None, out=None):
    """``mean(..., omitnan=True)`` (reference ``reduce.py:553``)."""
    return mean(input, dim=dim, keepdim=keepdim, omitnan=True, dtype=dtype)


def var(
    input,
    dim=None,
    keepdim: bool = False,
    unbiased: bool = True,
    omitnan: bool = False,
    inplace: bool = False,
    dtype=None,
    out=None,
):
    """Multi-dim variance (``unbiased`` = Bessel correction).

    Reference analog: ``reduce.py:597-637``.
    """
    x = jnp.asarray(input)
    if omitnan:
        return nanvar(x, dim=dim, keepdim=keepdim, unbiased=unbiased, dtype=dtype)
    axes, _ = _axes_or_none(dim, x.ndim)
    if dtype is not None:
        x = x.astype(dtype)
    return jnp.var(x, axis=axes, keepdims=keepdim, ddof=1 if unbiased else 0)


def nanvar(
    input,
    dim=None,
    keepdim: bool = False,
    unbiased: bool = True,
    inplace: bool = False,
    dtype=None,
    out=None,
):
    """NaN-omitting variance via masked moments.

    Computes ``E[x^2] - E[x]^2`` over non-NaN entries with ``w/(w-1)``
    Bessel correction. Note: the reference erroneously computes
    ``E[x^2] - E[x]`` (``reduce.py:678-681``); this is the corrected
    formula (documented divergence, SURVEY.md appendix).
    """
    x = jnp.asarray(input)
    axes, _ = _axes_or_none(dim, x.ndim)
    if dtype is not None:
        x = x.astype(dtype)
    isnan = jnp.isnan(x)
    xz = jnp.where(isnan, jnp.zeros((), x.dtype), x)
    w = jnp.sum(~isnan, axis=axes, keepdims=keepdim).astype(xz.dtype)
    m1 = jnp.sum(xz, axis=axes, keepdims=keepdim) / w
    m2 = jnp.sum(xz * xz, axis=axes, keepdims=keepdim) / w
    v = m2 - m1 * m1
    if unbiased:
        v = v * (w / (w - 1))
    return v


def std(
    input,
    dim=None,
    keepdim: bool = False,
    unbiased: bool = True,
    omitnan: bool = False,
    inplace: bool = False,
    dtype=None,
    out=None,
):
    """Standard deviation (reference ``reduce.py:688-728``)."""
    return jnp.sqrt(
        var(input, dim=dim, keepdim=keepdim, unbiased=unbiased,
            omitnan=omitnan, dtype=dtype)
    )


def nanstd(input, dim=None, keepdim=False, unbiased=True, inplace=False,
           dtype=None, out=None):
    """NaN-omitting standard deviation (reference ``reduce.py:729-763``)."""
    return jnp.sqrt(
        nanvar(input, dim=dim, keepdim=keepdim, unbiased=unbiased, dtype=dtype)
    )
