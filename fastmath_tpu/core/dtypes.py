"""Dtype utilities: machine epsilon, promotion rules, float checks.

Capability parity with the reference's ``utils.eps`` (reference:
``nitorch_fastmath/utils.py:232-249``) and the int->f64 / f16->f32
promotion used by its real transforms
(``nitorch_fastmath/_impl/realtransforms_from_fft.py:720-730``), re-done
for JAX dtypes (including bfloat16, which torch-era nitorch never had to
care about on this path).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["eps", "as_float", "result_real_dtype", "promote_transform_dtype"]


def eps(dtype) -> float:
    """Machine epsilon for a floating dtype.

    For complex dtypes, returns the epsilon of the component real dtype
    (matching reference ``utils.py:232-249`` semantics).
    """
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        dtype = jnp.finfo(dtype).dtype  # component real dtype
    if not jnp.issubdtype(dtype, jnp.floating):
        raise TypeError(f"eps() requires a floating dtype, got {dtype}")
    return float(jnp.finfo(dtype).eps)


def as_float(dtype):
    """Map any dtype to the floating dtype arithmetic should happen in.

    Integers/bools promote to the default float; floats/complex pass
    through unchanged.
    """
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating) or jnp.issubdtype(
        dtype, jnp.complexfloating
    ):
        return dtype
    return jnp.dtype(jnp.result_type(float))


def result_real_dtype(dtype):
    """The real dtype underlying ``dtype`` (identity for real floats)."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        return jnp.dtype(jnp.finfo(dtype).dtype)
    return dtype


def promote_transform_dtype(dtype):
    """Promotion rule for DCT/DST inputs (scipy-matching).

    int -> float64 (when x64 is enabled, else default float),
    float16/bfloat16 -> float32, everything else unchanged.
    Mirrors reference ``_impl/realtransforms_from_fft.py:720-730``.
    """
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_:
        # scipy promotes ints to float64; honor jax x64 setting.
        return jnp.dtype(jnp.promote_types(dtype, jnp.float64))
    if dtype in (jnp.dtype(jnp.float16), jnp.dtype(jnp.bfloat16)):
        return jnp.dtype(jnp.float32)
    if dtype == jnp.dtype(np.complex64) or dtype == jnp.dtype(np.complex128):
        return dtype
    return dtype
