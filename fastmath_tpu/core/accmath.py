"""Accurate elementwise transcendentals for TPU float32.

XLA's TPU lowering of ``log`` is a fast polynomial with measured error
up to **~4000 ulp** (abs 1.1e-4 on [0.05, 50], rel median 8.4e-6,
v5e, round 4 probe) — fine for ML losses, far outside this library's
~1e-5-class accuracy contracts. Ops whose *output* is a log (logdet,
the logm sym-eig route's Daleckii-Krein term, log-space special
functions) need a correctly rounded one.

``log`` here is the classic Cody-Waite / fdlibm construction, ~1-2 ulp
everywhere, built only from exact-or-half-ulp f32 primitives (frexp bit
extraction, Sterbenz-exact subtraction, FMA-friendly Horner):

* range-reduce ``x = m * 2^e`` with ``m in [sqrt(1/2), sqrt(2))``
  (``frexp`` is exact; the mantissa doubling is exact);
* ``log m = 2 atanh(s)``, ``s = (m-1)/(m+1)`` (``m-1`` is exact by
  Sterbenz; ``|s| < 0.1716`` so a 5-term odd polynomial already has
  relative error ~1e-9 — below half an f32 ulp);
* ``e * ln2`` in hi/lo pieces: ``LN2_HI`` has 11 trailing zero bits so
  ``e * LN2_HI`` is exact for ``|e| <= 1024``; the residual rides the
  low-order sum.

Cost: ~15 fused elementwise VPU ops instead of 1 — invisible next to
any matmul or reduction, and still stream-bound for elementwise use.

Non-finite / non-positive input defers to the platform ``log`` so IEEE
edge semantics (``log(0) = -inf``, ``log(-x) = nan``) are preserved.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["log"]

# classic cephes/fdlibm float32 Cody-Waite pair: LN2_HI is exactly
# representable with 11 trailing zero mantissa bits (0x3F318000)
_LN2_HI = 0.693359375
_LN2_LO = -2.12194440e-4
_SQRT_HALF = 0.7071067811865476


def log(x):
    """Accurate elementwise natural log for f32 (and exact passthrough
    semantics for f64, where XLA's log is already correctly rounded).

    ~1-2 ulp on every positive finite float32 vs XLA TPU's measured
    ~4000-ulp worst case. Hardware-measured round 5
    (``bench/tpu_probe_mosaic_log.py``, 4M-point sweep of
    [1e-30, 1e30] + the [0.05, 50] worst band + near-1): this log
    med 0.29 / p99 1.7 / max 4.0 ulp; XLA ``jnp.log`` on identical
    data med 22.6 / p99 2563 / max 4029 ulp. See module docstring.
    """
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        return jnp.log(x)
    m, e = jnp.frexp(x)  # x = m * 2^e, m in [0.5, 1)
    adj = m < _SQRT_HALF
    m = jnp.where(adj, m + m, m)  # m in [sqrt(1/2), sqrt(2))
    ef = (e - adj.astype(e.dtype)).astype(x.dtype)
    s = (m - 1.0) / (m + 1.0)
    s2 = s * s
    # 2*atanh(s) = 2s(1 + s2/3 + s2^2/5 + s2^3/7 + s2^4/9); s2 < 0.0295
    p = 2.0 * s * (1.0 + s2 * (1.0 / 3.0 + s2 * (
        1.0 / 5.0 + s2 * (1.0 / 7.0 + s2 * (1.0 / 9.0)))))
    acc = ef * _LN2_HI + (p + ef * _LN2_LO)
    ok = jnp.isfinite(x) & (x > 0)
    return jnp.where(ok, acc, jnp.log(jnp.where(ok, 1.0, x)))
