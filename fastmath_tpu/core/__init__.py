"""Core utilities: dtypes, shapes/indices, broadcasting."""
from .dtypes import eps, as_float, result_real_dtype, promote_transform_dtype
from .shapes import (
    ensure_tuple,
    normalize_axes,
    sub2ind,
    ind2sub,
    broadcast_batch_shapes,
)

__all__ = [
    "eps",
    "as_float",
    "result_real_dtype",
    "promote_transform_dtype",
    "ensure_tuple",
    "normalize_axes",
    "sub2ind",
    "ind2sub",
    "broadcast_batch_shapes",
]
