"""Measure Mosaic's in-kernel ``jnp.log`` accuracy on real TPU.

Round-4 measured XLA TPU f32 ``log`` at ~4000 ulp worst-case (abs
1.1e-4 on [0.05, 50]) and rerouted every *op-level* log output through
``core.accmath.log`` — but the logdet Pallas kernels take ``jnp.log``
*inside* the kernel body (``kernels/batched_pallas.py:130-179``),
where Mosaic emits its own lowering. CLAUDE.md round-4: "Mosaic
in-kernel ``jnp.log`` accuracy unmeasured". This probe measures it
directly: an elementwise log kernel over a dense log-spaced range,
compared against float64 numpy, side by side with XLA's ``jnp.log``
and ``accmath.log`` on identical data.

Usage (TPU):  python bench/tpu_probe_mosaic_log.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from fastmath_tpu.core.accmath import log as acclog


def _log_kernel(x_ref, o_ref):
    o_ref[...] = jnp.log(x_ref[...])


def _gridded(kernel, x):
    # (rows, 1024) f32 whole-array blocks OOM scoped VMEM (16 MiB in +
    # 16 MiB out) — grid over row blocks instead
    interpret = jax.default_backend() != "tpu"
    rb = 256
    return pl.pallas_call(
        kernel,
        grid=(x.shape[0] // rb,),
        in_specs=[pl.BlockSpec((rb, x.shape[1]), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rb, x.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


def mosaic_log(x):
    return _gridded(_log_kernel, x)


def _acclog_kernel(x_ref, o_ref):
    o_ref[...] = acclog(x_ref[...])


def mosaic_acclog(x):
    return _gridded(_acclog_kernel, x)


def ulp_err(got, x64):
    want = np.log(x64)
    w32 = want.astype(np.float32)
    ulp = np.spacing(np.abs(w32)).astype(np.float64)
    return np.abs(got.astype(np.float64) - want) / ulp


def main():
    n = 1 << 22
    # dense sweep of the library's working range, incl. the round-4
    # worst band [0.05, 50] and near-1 cancellation territory
    x64 = np.concatenate([
        np.logspace(-30, 30, n // 2),
        np.linspace(0.05, 50.0, n // 4),
        1.0 + np.linspace(-0.4, 0.4, n // 4),
    ])
    # Mosaic-friendly 2-D layout: (sublane multiple of 8, lane 128k)
    x = jnp.asarray(x64.astype(np.float32)).reshape(-1, 1024)
    x64 = np.asarray(x, np.float64).ravel()  # vs the f32-rounded inputs

    rows = []
    for name, fn in (("xla jnp.log", jax.jit(jnp.log)),
                     ("mosaic jnp.log", jax.jit(mosaic_log)),
                     ("op-level accmath.log", jax.jit(acclog)),
                     ("mosaic accmath.log", jax.jit(mosaic_acclog))):
        try:
            got = np.asarray(fn(x))
        except Exception as e:  # a Mosaic lowering gap is a finding too
            print(f"{name:>22}: FAILED to lower/run: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        e = ulp_err(got.ravel(), x64)
        fin = np.isfinite(e)
        e = e[fin]
        rows.append((name, np.median(e), np.quantile(e, 0.99), e.max()))
        print(f"{name:>22}: ulp med={rows[-1][1]:.2f} "
              f"p99={rows[-1][2]:.2f} max={rows[-1][3]:.1f}", flush=True)

    # drain through a scalar (axon relay rule)
    print("drain", float(jnp.sum(x[:8])), flush=True)


if __name__ == "__main__":
    main()
