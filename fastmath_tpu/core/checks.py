"""Numerical tripwires (SURVEY.md §5: the reference's closest artifacts
are ``check_finite`` flags; the TPU build adds checkify/debug_nans
wrappers).
"""
from __future__ import annotations

import contextlib
from typing import Callable

import jax
from jax.experimental import checkify

__all__ = ["checked", "debug_nans", "assert_finite"]


def checked(fn: Callable, *, nan: bool = True, div: bool = True,
            oob: bool = False) -> Callable:
    """Wrap ``fn`` with jax.experimental.checkify so NaN production /
    division errors surface as Python errors with source locations
    (works under jit; the functional analog of the reference's
    ``check_finite`` flags)."""
    errors = set()
    if nan:
        errors |= checkify.nan_checks
    if div:
        errors |= checkify.div_checks
    if oob:
        errors |= checkify.index_checks
    cfn = checkify.checkify(fn, errors=frozenset(errors))

    def wrapped(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapped


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Context manager toggling jax_debug_nans (eager NaN tripwire)."""
    old = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def assert_finite(x, name: str = "input"):
    """Host-level finite check (raises ValueError), the direct analog of
    the reference's ``check_finite`` validation (``qr.py:93`` etc.).
    Not usable under jit — use :func:`checked` there."""
    import jax.numpy as jnp

    if isinstance(x, jax.core.Tracer):
        raise TypeError("assert_finite is host-only; use checked() under jit")
    if not bool(jnp.all(jnp.isfinite(x))):
        raise ValueError(f"{name} has non finite values.")
    return x
