"""Core utilities: dtypes, shapes/indices, broadcasting, compile cache."""
from .cache import enable_compilation_cache, compilation_cache_dir
from .dtypes import eps, as_float, result_real_dtype, promote_transform_dtype
from .shapes import (
    ensure_tuple,
    normalize_axes,
    sub2ind,
    ind2sub,
    broadcast_batch_shapes,
)

__all__ = [
    "enable_compilation_cache",
    "compilation_cache_dir",
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
