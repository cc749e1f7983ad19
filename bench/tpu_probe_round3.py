"""One-shot TPU validation + micro-measure for the round-3 additions.

Run on the real chip (plain `python bench/tpu_probe_round3.py`):
  1. expm/logm d = 8 (unrolled PLU tier) and d = 16 (rolled
     stacked-grid tier) — Mosaic lowering check + parity vs scipy.
  2. sym_maxeig renorm_every in {1, 8, 16} — throughput of the strided
     renormalization vs per-step.
Prints one line per check; exits nonzero on any parity failure.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg as sla

from fastmath_tpu.layouts import full_to_sym
from fastmath_tpu.ops import lie as L
from fastmath_tpu.ops.sym import sym_maxeig

print("backend:", jax.default_backend(), jax.devices(), flush=True)
rng = np.random.default_rng(0)
fail = 0


def drain(x):
    return float(jnp.sum(x))


# ---- expm/logm tiers ----
for d in (8, 16):
    b = 200_000 if d == 8 else 50_000
    X = (rng.standard_normal((b, d, d)) * (0.5 / np.sqrt(d))).astype(
        np.float32)
    Xj = jax.device_put(jnp.asarray(X))
    f = jax.jit(L.expm)
    t0 = time.time()
    E = f(Xj)
    drain(E)
    print(f"expm d={d}: first call {time.time()-t0:.1f}s", flush=True)
    want = np.stack([sla.expm(np.asarray(m, np.float64)) for m in X[:128]])
    got = np.asarray(E[:128], np.float64)
    r = np.abs(got - want) / (np.abs(want) + 1e-30)
    print(f"expm d={d}: med {np.median(r):.2e} p99 "
          f"{np.quantile(r, 0.99):.2e}", flush=True)
    # NaN-closed gate: `not (x < tol)` fails on NaN, `x > tol` passes it
    if not (np.median(r) < 1e-6):
        print(f"FAIL expm d={d}", flush=True)
        fail = 1
    # throughput (8 pipelined dispatches)
    t0 = time.time()
    for _ in range(8):
        E = f(Xj)
    drain(E)
    dt = (time.time() - t0) / 8
    print(f"expm d={d}: {b/dt:.3e} expm/s", flush=True)

    # drive the KERNEL directly: the public logm's exceptional-branch
    # rescue would silently recompute NaN'd lanes on the XLA path and
    # mask a broken Mosaic lowering
    from fastmath_tpu.kernels.logm_pallas import logm_cf

    g = jax.jit(lambda e: jnp.moveaxis(
        logm_cf(jnp.moveaxis(e.reshape(-1, d * d), 0, -1)), -1, 0
    ).reshape(e.shape))
    t0 = time.time()
    Lg = g(E)
    drain(Lg)
    print(f"logm d={d} (kernel): first call {time.time()-t0:.1f}s",
          flush=True)
    back = np.asarray(Lg[:4096], np.float64)
    finite_frac = float(np.isfinite(back).all(axis=(1, 2)).mean())
    r = np.abs(back - X[:4096]) / (np.abs(X[:4096]) + 1e-5)
    print(f"logm d={d} roundtrip: med {np.nanmedian(r):.2e} p99 "
          f"{np.nanquantile(r, 0.99):.2e} finite {finite_frac:.3f}",
          flush=True)
    # NaN-closed: median must be finite-small AND (off-cut inputs) no
    # lane may have NaN'd into the rescue path
    if not (np.nanmedian(r) < 1e-5) or finite_frac < 0.999:
        print(f"FAIL logm d={d}", flush=True)
        fail = 1
    t0 = time.time()
    for _ in range(8):
        Lg = g(E)
    drain(Lg)
    dt = (time.time() - t0) / 8
    print(f"logm d={d}: {b/dt:.3e} logm/s", flush=True)
    del Xj, E, Lg

# ---- maxeig renorm strides ----
B, n = 1_000_000, 4
a = rng.standard_normal((B, n, n)).astype(np.float32)
spd = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n, dtype=np.float32)
u = rng.standard_normal((B, n)).astype(np.float32)
u /= np.linalg.norm(u, axis=-1, keepdims=True)
spd += 8.0 * n * np.einsum("bi,bj->bij", u, u).astype(np.float32)
cm = jax.device_put(jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd)))))
w = np.linalg.eigvalsh(spd[:4096].astype(np.float64))
dom = w[np.arange(4096), np.argmax(np.abs(w), axis=-1)]
for iters in (32, 128):
    for rn in (1, 8, 16):
        f = jax.jit(lambda m, it=iters, rn=rn: sym_maxeig(
            m, iters=it, renorm_every=rn))
        drain(f(cm))  # compile
        t0 = time.time()
        for _ in range(12):
            out = f(cm)
        drain(out)
        dt = (time.time() - t0) / 12
        got = np.asarray(f(cm[:4096]), np.float64)
        err = np.median(np.abs(got - dom) / np.abs(dom))
        print(f"maxeig 4x4 iters={iters} renorm={rn}: {B/dt:.3e} eig/s "
              f"({B*iters/dt:.3e} mv-iter/s), med rel-err {err:.1e}",
              flush=True)
        if not (err < 1e-5):
            print(f"FAIL maxeig renorm={rn}", flush=True)
            fail = 1

print("PROBE", "FAILED" if fail else "PASSED", flush=True)
sys.exit(fail)
