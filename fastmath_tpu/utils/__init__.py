"""General helpers, API-parity with the reference's ``utils`` module
(``nitorch_fastmath/utils.py``): ``ensure_list``, ``slice_tensor`` /
``fast_slice_tensor``, ``cumprod``, ``sub2ind`` / ``ind2sub``, ``eps``,
``broadcast_backward``. The AMP decorators ``custom_fwd``/``custom_bwd``
(``utils.py:4-8``) are no-ops here — JAX handles mixed precision by
dtype, not autocast context.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.dtypes import eps
from ..core.shapes import ensure_tuple, ind2sub, sub2ind

__all__ = [
    "ensure_list",
    "ensure_tuple",
    "fast_slice_tensor",
    "slice_tensor",
    "cumprod",
    "sub2ind",
    "ind2sub",
    "eps",
    "broadcast_backward",
    "custom_fwd",
    "custom_bwd",
]


def custom_fwd(fn):
    """No-op AMP decorator (reference ``utils.py:4-8`` fallback path)."""
    return fn


def custom_bwd(fn):
    """No-op AMP decorator (reference ``utils.py:4-8`` fallback path)."""
    return fn


def ensure_list(x, n: Optional[int] = None) -> list:
    """Make ``x`` a list; if ``n`` given, cycle/truncate to length n
    (reference ``utils.py:11-28``)."""
    return list(ensure_tuple(x, n))


def fast_slice_tensor(x, index, dim: int = -1):
    """Index a single dimension with an int or slice (reference
    ``utils.py:30-57``)."""
    idx = [slice(None)] * jnp.ndim(x)
    idx[dim] = index
    return jnp.asarray(x)[tuple(idx)]


def slice_tensor(x, index, dim=None):
    """Index one or several dimensions with ints/slices (reference
    ``utils.py:60-108``)."""
    if dim is None:
        index = ensure_tuple(index)
        dim = tuple(range(-len(index), 0))
    dims = ensure_tuple(dim)
    indices = ensure_tuple(index, len(dims))
    idx = [slice(None)] * jnp.ndim(x)
    for d, i in zip(dims, indices):
        idx[d] = i
    return jnp.asarray(x)[tuple(idx)]


def cumprod(sequence, reverse: bool = False, exclusive: bool = False) -> list:
    """Cumulative product of a python sequence (reference
    ``utils.py:111-145``)."""
    seq = list(sequence)
    if reverse:
        seq = seq[::-1]
    out = []
    acc = 1
    for v in seq:
        if exclusive:
            out.append(acc)
            acc = acc * v
        else:
            acc = acc * v
            out.append(acc)
    if reverse:
        out = out[::-1]
    return out


def broadcast_backward(grad, shape) -> jnp.ndarray:
    """Sum-reduce a gradient over broadcast dimensions so it matches
    ``shape`` (reference ``utils.py:252-278``)."""
    grad = jnp.asarray(grad)
    shape = tuple(shape)
    extra = grad.ndim - len(shape)
    if extra:
        grad = jnp.sum(grad, axis=tuple(range(extra)))
    axes = tuple(
        i for i, (g, s) in enumerate(zip(grad.shape, shape)) if s == 1 and g != 1
    )
    if axes:
        grad = jnp.sum(grad, axis=axes, keepdims=True)
    return grad
