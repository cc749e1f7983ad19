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
    "downcast",
]

_HALF_DTYPES = (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16))


def upcast_half(*arrays):
    """bf16/f16 internal-compute contract for the linalg tier: upcast
    half-precision inputs to float32 and report the dtype to cast the
    result back to.

    Returns ``(*arrays, half)`` where ``half`` is the dtype to round
    the result back to (``None`` when the result should stay in the
    computed dtype). The result dtype follows **JAX promotion over all
    inputs**: mixed half/full inputs promote to the full precision
    (an f32 or f64 operand is never silently rounded to half because a
    bf16 operand sat next to it); only when the promoted result itself
    is half does the op compute in f32 and round once on the way out.
    Bool/int inputs promote to the default float (closed-form
    adjugate/LU arithmetic must run in floating point — integer
    division truncates silently). Closed forms in bf16 lose all
    significance (8-bit mantissa through an O(n^3) cancellation
    chain) — the same contract as ``ops.special._upcast`` (BASELINE
    configs[3]) extended to configs[0]/[2].
    """
    arrays = [jnp.asarray(a) for a in arrays]
    out = jnp.result_type(*arrays)
    if not (
        jnp.issubdtype(out, jnp.floating)
        or jnp.issubdtype(out, jnp.complexfloating)
    ):
        out = jnp.dtype(jnp.result_type(float))
    if jnp.dtype(out) in _HALF_DTYPES:
        return (*[a.astype(jnp.float32) for a in arrays], jnp.dtype(out))
    return (*[a.astype(out) for a in arrays], None)


def downcast(x, half):
    """Round ``x`` back to the ``half`` dtype reported by
    :func:`upcast_half` (identity when ``half`` is ``None``)."""
    return x if half is None else x.astype(half)


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
