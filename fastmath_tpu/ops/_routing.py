"""Native-tier dispatch policy for the public ops.

The reference's architecture makes the native kernels the *default*:
``from jitfields.sym import *`` shadows every pure-torch fallback
(reference ``sym.py:37``), so a user calling ``sym_solve`` gets
C++/CUDA. This module is the TPU-native equivalent of that shadowing —
every public sym/batched op takes ``backend="auto"`` and routes to its
Pallas kernel in the regimes where the kernel wins, measured on this
hardware (``BENCH_MEASURED.md``, CLAUDE.md perf lore):

* **register-resident iteration** (pivoted-LU solve/invert/det at
  5 <= N <= 8, rolled stacked-grid PLU 9 <= N <= 32, eig to N <= 32,
  expm/logm, rolled Cholesky and congruence-product (JhJ) tiers at
  17/7 <= N <= 32): Pallas beats fused XLA 10-70x — route whenever
  the batch is big enough to fill a lane block;
* **N <= 4 closed forms**: one fused XLA kernel is already at the
  dispatch/bandwidth bound and *chains* better (``lax.scan`` of
  dependent solves reaches 70% of the stream ceiling); Pallas only
  wins for very large unchained batches (measured crossover ~8M) —
  route there only;
* **purely elementwise memory-bound ops** (matvec, outer, add/sub
  matvec, jhj): XLA's fused pipeline out-streams the Pallas grid
  (676 vs ~320 GB/s) — never auto-route; ``backend="pallas"`` forces.

``backend``: ``"auto"`` (policy above), ``"xla"`` (always the fused-XLA
path), ``"pallas"`` (force the native kernel; raises when the op/shape
is outside the kernel's domain, like ``eig_sym`` — ``ops/qr.py``).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["use_pallas", "nbatch"]

#: below this many lanes the pad-to-block + dispatch overhead of a
#: pallas_call outweighs the kernel win (one DEFAULT_BLOCK is 8192)
MIN_BATCH = 4096
#: N <= 4 closed forms: fused XLA wins below this (measured crossover —
#: "pallas wins at >= 8M unchained", CLAUDE.md round-2)
MIN_BATCH_SMALL_N = 8_000_000


def nbatch(*arrays) -> int:
    """Static broadcasted batch size of ``(..., C)`` operands (product
    of the broadcast of every array's leading dims)."""
    import numpy as np

    shapes = [a.shape[:-1] for a in arrays]
    return int(math.prod(np.broadcast_shapes(*shapes))) if shapes else 0


def use_pallas(
    backend: str,
    *,
    supported: bool,
    batch: int,
    dtype=None,
    small_n: bool = False,
    why_unsupported: str = "",
) -> bool:
    """Decide whether a public op call runs on its Pallas kernel.

    ``supported``: the kernel implements this (N, dtype family, layout)
    — callers pass real-floating-ness and the N gate here.
    ``small_n``: the op has a competitive fused-XLA closed form
    (N <= 4 tier) so auto only routes at very large batches.
    ``dtype``: post-upcast compute dtype; auto-routing on hardware
    requires f32 (f64 Pallas only exists in interpret mode — explicit
    ``backend="pallas"`` still honors it there, e.g. the CPU test
    suite under x64).
    """
    if backend == "xla":
        return False
    if backend == "pallas":
        if not supported:
            raise ValueError(
                "backend='pallas' unsupported here"
                f"{': ' if why_unsupported else ''}{why_unsupported}"
            )
        return True
    if backend != "auto":
        raise ValueError(f"unknown backend {backend!r}")
    if not supported or jax.default_backend() != "tpu":
        return False
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False
    return batch >= (MIN_BATCH_SMALL_N if small_n else MIN_BATCH)
