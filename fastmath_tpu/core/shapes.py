"""Shape/broadcast helpers shared across ops.

JAX-native replacements for the reference's ad-hoc helpers
(``nitorch_fastmath/utils.py``: ``ensure_list:11``, ``sub2ind:148``,
``ind2sub:196``, ``broadcast_backward:252``). All index math is
trace-time static where possible; ``ind2sub``/``sub2ind`` operate on
arrays of flat indices for the reduction ``return_indices`` path.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "ensure_tuple",
    "normalize_axes",
    "sub2ind",
    "ind2sub",
    "broadcast_batch_shapes",
]


def ensure_tuple(x, n: int | None = None) -> tuple:
    """Make ``x`` a tuple; if ``n`` is given, cycle/truncate to length n.

    Mirrors reference ``utils.ensure_list`` (``utils.py:11-28``) semantics
    but returns an immutable tuple (JAX pytrees prefer tuples).
    """
    if isinstance(x, (list, tuple)):
        x = tuple(x)
    elif isinstance(x, (np.ndarray, jnp.ndarray)) and x.ndim > 0:
        x = tuple(x.tolist())
    else:
        x = (x,)
    if n is not None:
        if len(x) == 0:
            raise ValueError("cannot cycle an empty sequence")
        if len(x) < n:
            x = x + (x[-1],) * (n - len(x))
        elif len(x) > n:
            x = x[:n]
    return x


def normalize_axes(axes, ndim: int) -> Tuple[int, ...]:
    """Canonicalize an int-or-sequence ``axes`` argument to a sorted tuple
    of unique non-negative axes."""
    if axes is None:
        return tuple(range(ndim))
    axes = ensure_tuple(axes)
    out = []
    for ax in axes:
        ax = int(ax)
        if ax < 0:
            ax += ndim
        if not 0 <= ax < ndim:
            raise ValueError(f"axis {ax} out of range for ndim {ndim}")
        out.append(ax)
    if len(set(out)) != len(out):
        raise ValueError(f"duplicate axes in {axes}")
    return tuple(sorted(out))


def _row_major_strides(shape: Sequence[int]) -> Tuple[int, ...]:
    strides = [1] * len(shape)
    for i in range(len(shape) - 2, -1, -1):
        strides[i] = strides[i + 1] * shape[i + 1]
    return tuple(strides)


def sub2ind(subs, shape: Sequence[int]):
    """Convert multi-indices (stacked along the first axis of ``subs`` or a
    sequence of arrays) into row-major flat indices.

    Reference analog: ``utils.sub2ind`` (``utils.py:148-183``).
    """
    strides = _row_major_strides(shape)
    if isinstance(subs, (list, tuple)):
        parts = subs
    else:
        parts = [subs[i] for i in range(subs.shape[0])]
    if len(parts) != len(shape):
        raise ValueError("number of index arrays must match len(shape)")
    flat = 0
    for sub, stride in zip(parts, strides):
        flat = flat + jnp.asarray(sub) * stride
    return flat


def ind2sub(flat, shape: Sequence[int]):
    """Convert row-major flat indices to multi-indices, stacked along a new
    leading axis (shape ``(len(shape), *flat.shape)``).

    Reference analog: ``utils.ind2sub`` (``utils.py:196-229``).
    """
    flat = jnp.asarray(flat)
    strides = _row_major_strides(shape)
    subs = []
    rem = flat
    for stride in strides:
        subs.append(rem // stride)
        rem = rem % stride
    return jnp.stack(subs, axis=0)


def broadcast_batch_shapes(*shapes: Sequence[int]) -> Tuple[int, ...]:
    """NumPy-style broadcast of batch shapes (static, trace-time)."""
    return tuple(np.broadcast_shapes(*[tuple(s) for s in shapes]))
