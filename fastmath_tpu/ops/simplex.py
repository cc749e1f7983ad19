"""Simplex utilities: softmax / log_softmax / logsumexp / logit /
softmax_lse with **implicit class** conventions.

Capability parity with the reference's ``simplex`` module
(``nitorch_fastmath/simplex.py``). The implicit-class convention
(``simplex.py:10-33``): discrete probabilities live on a K-1-dimensional
simplex, so one class ("the implicit class", default index 0) may be
represented implicitly — its logit is fixed to zero, or its probability
to ``1 - sum(others)``. Every function takes ``implicit`` as one bool or
an ``(input_implicit, output_implicit)`` pair, plus ``implicit_index``.

TPU-first design notes:

* ``logsumexp`` and the softmax core are ``jax.custom_vjp`` ops that
  save minimal residuals (the input, resp. the probabilities), mirroring
  the reference's memory rationale (``simplex.py:28-33``) — the VJP of
  both the explicit and implicit softmax cores is the same
  ``p * (g - <g, p>)`` form, so one rule serves both.
* Class insertion/removal are pure slicing/concat (linear; JAX AD
  differentiates them exactly), replacing the reference's
  ``_add_class``/``_remove_class`` tensor surgery (``simplex.py:131-160``).
* ``softmax_lse`` fuses the softmax with a weighted total log-evidence
  accumulated in float64 (reference ``simplex.py:369-431``) — on TPU the
  f64 accumulation happens in one XLA reduce.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.shapes import ensure_tuple

# core.accmath.log, not jnp.log, on every log-output path: XLA TPU's
# f32 log is ~4000 ulp worst-case (measured round 4); it dominated
# logsumexp's f32 tail (p99 3.2e-5, BENCH r4). ~15 VPU ops, invisible
# next to the exp/reduce this module is bound by.
from ..core.accmath import log as _log

__all__ = [
    "logsumexp",
    "softmax",
    "log_softmax",
    "logit",
    "softmax_lse",
]


def _norm_index(index: int, k: int) -> int:
    """Normalize an implicit-class index against axis length k."""
    if index < 0:
        index += k
    if not 0 <= index < k:
        raise ValueError(f"implicit_index {index} out of range for {k} classes")
    return index


def _insert_class(x, value, dim: int, index: int):
    """Insert a channel (scalar or array broadcastable to one slice) at
    ``index`` along ``dim``."""
    dim = dim % x.ndim
    k = x.shape[dim] + 1
    index = _norm_index(index, k)
    shape = list(x.shape)
    shape[dim] = 1
    value = jnp.broadcast_to(jnp.asarray(value, dtype=x.dtype), shape)
    pre = jax.lax.slice_in_dim(x, 0, index, axis=dim)
    post = jax.lax.slice_in_dim(x, index, x.shape[dim], axis=dim)
    return jnp.concatenate([pre, value, post], axis=dim)


def _drop_class(x, dim: int, index: int):
    """Drop the channel at ``index`` along ``dim``."""
    dim = dim % x.ndim
    k = x.shape[dim]
    index = _norm_index(index, k)
    pre = jax.lax.slice_in_dim(x, 0, index, axis=dim)
    post = jax.lax.slice_in_dim(x, index + 1, k, axis=dim)
    return jnp.concatenate([pre, post], axis=dim)


# ---------------------------------------------------------------------------
# logsumexp with implicit zero class
# ---------------------------------------------------------------------------


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _lse_core(x, dim: int, implicit: bool):
    m = jnp.max(x, axis=dim, keepdims=True)
    if implicit:
        m = jnp.maximum(m, 0.0)
    s = jnp.sum(jnp.exp(x - m), axis=dim, keepdims=True)
    if implicit:
        s = s + jnp.exp(-m)
    return m + _log(s)


def _lse_fwd(x, dim, implicit):
    # memory-minimal: save only the input, recompute the softmax in bwd
    # (reference rationale at simplex.py:28-33, bwd at :97-102)
    return _lse_core(x, dim, implicit), x


def _lse_bwd(dim, implicit, x, g):
    return (_softmax_core(x, dim, implicit) * g,)


_lse_core.defvjp(_lse_fwd, _lse_bwd)


def logsumexp(input, dim: int = -1, keepdim: bool = False, implicit: bool = False):
    """Stable log-sum-exp along ``dim``; ``implicit=True`` folds in a
    hidden zero-logit class. Reference analog: ``simplex.py:51-128``.
    """
    x = jnp.asarray(input)
    out = _lse_core(x, dim, bool(implicit))
    if not keepdim:
        out = jnp.squeeze(out, axis=dim)
    return out


# ---------------------------------------------------------------------------
# softmax core (explicit or implicit input) with shared custom VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _softmax_core(x, dim: int, implicit: bool):
    """Probabilities of the *explicit* channels. With ``implicit=True``
    the normalizer includes the hidden zero-logit class, so the output
    sums to < 1 and the hidden probability is ``1 - sum``."""
    m = jnp.max(x, axis=dim, keepdims=True)
    if implicit:
        m = jnp.maximum(m, 0.0)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=dim, keepdims=True)
    if implicit:
        s = s + jnp.exp(-m)
    return e / s


def _softmax_core_fwd(x, dim, implicit):
    # memory-minimal: save only the probabilities (reference _Softmax
    # saves s, simplex.py:240-266)
    p = _softmax_core(x, dim, implicit)
    return p, p


def _softmax_core_bwd(dim, implicit, p, g):
    # Jacobian of both explicit and implicit softmax: diag(p) - p p^T
    dot = jnp.sum(g * p, axis=dim, keepdims=True)
    return (p * (g - dot),)


_softmax_core.defvjp(_softmax_core_fwd, _softmax_core_bwd)


def softmax(
    input,
    dim: int = -1,
    implicit=False,
    implicit_index: int = 0,
):
    """Safe softmax with implicit-class handling.

    ``implicit = (in_implicit, out_implicit)`` (one bool broadcasts to
    both): an implicit input has a hidden zero-logit class; an implicit
    output drops the class at ``implicit_index``. Reference analog:
    ``simplex.py:163-266``.
    """
    x = jnp.asarray(input)
    implicit_in, implicit_out = ensure_tuple(implicit, 2)
    p = _softmax_core(x, dim, bool(implicit_in))
    if implicit_in and not implicit_out:
        bg = 1.0 - jnp.sum(p, axis=dim, keepdims=True)
        p = _insert_class(p, bg, dim, implicit_index)
    elif implicit_out and not implicit_in:
        p = _drop_class(p, dim, implicit_index)
    return p


def log_softmax(
    input,
    dim: int = -1,
    implicit=False,
    implicit_index: int = 0,
):
    """Log-softmax with implicit-class handling (reference
    ``simplex.py:326-366``)."""
    x = jnp.asarray(input)
    implicit_in, implicit_out = ensure_tuple(implicit, 2)
    lse = _lse_core(x, dim, bool(implicit_in))
    if implicit_in and not implicit_out:
        out = _insert_class(x, 0.0, dim, implicit_index)
        return out - lse
    if implicit_out and not implicit_in:
        return _drop_class(x, dim, implicit_index) - lse
    return x - lse


def logit(
    input,
    dim: int = -1,
    implicit=False,
    implicit_index: int = 0,
):
    r"""(Multiclass) logit — inverse of :func:`softmax`:
    ``logit(p)_k = log(p_k) - log(p_ref)`` with the reference channel at
    ``implicit_index``. Reference analog: ``simplex.py:268-324``
    (semantics preserved exactly, incl. the ``1e-8`` clamp on the hidden
    probability).
    """
    x = jnp.asarray(input)
    implicit_in, implicit_out = ensure_tuple(implicit, 2)
    if implicit_in:
        hidden = 1.0 - jnp.sum(x, axis=dim, keepdims=True)
        ref = _log(jnp.maximum(hidden, 1e-8))
        out = _log(x) - ref
        if not implicit_out:
            out = _insert_class(out, 0.0, dim, implicit_index)
        return out
    logx = _log(x)
    axis = dim % x.ndim
    idx = _norm_index(implicit_index, x.shape[axis])
    ref = jax.lax.slice_in_dim(logx, idx, idx + 1, axis=axis)
    if implicit_out:
        logx = _drop_class(logx, dim, implicit_index)
    return logx - ref


def softmax_lse(
    input,
    dim: int = -1,
    weights: Optional[jnp.ndarray] = None,
    implicit=False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused softmax + total (weighted) log-sum-exp, the EM-style model
    evidence accumulator. Returns ``(softmax, lse_total)`` where
    ``lse_total`` is a float64 scalar sum over all positions (reference
    ``simplex.py:369-431``; note it appends/drops the *last* class, not
    ``implicit_index``)."""
    x = jnp.asarray(input)
    implicit_in, implicit_out = ensure_tuple(implicit, 2)
    m = jnp.max(x, axis=dim, keepdims=True)
    if implicit_in:
        m = jnp.maximum(m, 0.0)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=dim, keepdims=True)
    if implicit_in:
        s = s + jnp.exp(-m)
    p = e / s
    lse = m + _log(s)
    if weights is not None:
        lse = lse * weights
    acc_dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    lse_total = jnp.sum(lse, dtype=acc_dtype)
    if implicit_in and not implicit_out:
        bg = 1.0 - jnp.sum(p, axis=dim, keepdims=True)
        p = jnp.concatenate([p, bg], axis=dim)
    elif implicit_out and not implicit_in:
        p = jax.lax.slice_in_dim(p, 0, p.shape[dim] - 1, axis=dim)
    return p, lse_total
