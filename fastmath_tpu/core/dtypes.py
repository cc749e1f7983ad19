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

__all__ = [
    "eps",
    "as_float",
    "result_real_dtype",
    "promote_transform_dtype",
    "upcast_half",
]

_HALF_DTYPES = (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16))


def upcast_half(*arrays):
    """bf16/f16 internal-compute contract for the linalg tier: upcast
    half-precision inputs to float32 and report the dtype to cast the
    result back to.

    Returns ``(*arrays, half)`` where ``half`` is the common half dtype
    (``None`` when nothing was upcast — the caller returns results
    unchanged). Closed-form adjugate/LU arithmetic in bf16 loses all
    significance (8-bit mantissa through an O(n^3) cancellation chain),
    so the public ops compute in f32 and round once on the way out —
    the same contract as ``ops.special._upcast`` (BASELINE configs[3])
    extended to configs[0]/[2].
    """
    arrays = [jnp.asarray(a) for a in arrays]
    halfs = {a.dtype for a in arrays if a.dtype in _HALF_DTYPES}
    if not halfs:
        return (*arrays, None)
    out = halfs.pop() if len(halfs) == 1 else jnp.dtype(jnp.float32)
    arrays = [
        a.astype(jnp.float32) if a.dtype in _HALF_DTYPES else a
        for a in arrays
    ]
    return (*arrays, None if out == jnp.dtype(jnp.float32) else out)


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
