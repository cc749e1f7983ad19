"""Hardware validation + measurement of the expm/logm rolled tier past
d = 16 (expm to d <= 32; logm to d <= 24 — see the cap note below).

    python bench/tpu_probe_lie32.py

Measured on the tunnel v5e (2026-08-18): expm pallas 5.2e6/s at d=20
(14.0x XLA) and 1.5e6/s at d=32 (7.4x), parity vs the XLA
scaling-and-squaring <= 2.1e-06 normwise. logm kernel 2.9e5/s at d=20
and 1.5e5/s at d=24 vs the XLA ISS tier's 7.9e3/4.7e3 (23-37x),
roundtrip med ~1e-06.

Why logm caps at 24 while expm reaches 32: the logm kernel nests
while(DB-sqrt while(rolled-PLU fori)) and holds ~17 live stacked
grids; at d=32 (~68 MiB of live state) the Mosaic compile ran past 27
minutes (killed), while d=24 compiles in ~2 minutes. d in 25..32
serves the XLA ISS tier (still device-resident and batched — the
reference's logm is a per-matrix scipy CPU loop).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastmath_tpu.ops import lie as L  # noqa: E402

print("backend:", jax.default_backend(), jax.devices(), flush=True)
rng = np.random.default_rng(5)
fail = []


def drain(x):
    return float(jnp.sum(x))


def rate(f, *a, calls=8):
    drain(f(*a))
    t0 = time.time()
    for _ in range(calls - 1):
        f(*a)
    drain(f(*a))
    return (time.time() - t0) / calls


def gate(name, err, tol):
    ok = err < tol
    print(f"  {name}: {err:.1e} ({'ok' if ok else 'FAIL'} < {tol:.0e})",
          flush=True)
    if not ok:
        fail.append(name)


for d, b in ((20, 100_000), (32, 50_000)):
    X = (rng.standard_normal((b, d, d))
         * (0.8 / np.sqrt(d))).astype(np.float32)
    Xj = jax.device_put(jnp.asarray(X))
    fp = jax.jit(lambda x: L.expm(x, backend="pallas"))
    t0 = time.time()
    drain(fp(Xj))
    print(f"expm d={d}: first call {time.time() - t0:.0f}s", flush=True)
    Ep = np.asarray(fp(Xj[:2048]), np.float64)
    fx = jax.jit(lambda x: L.expm(x, backend="xla"))
    Ex = np.asarray(fx(Xj[:2048]), np.float64)
    nw = (np.linalg.norm(Ep - Ex, axis=(-2, -1))
          / np.linalg.norm(Ex, axis=(-2, -1)))
    dt, dtx = rate(fp, Xj), rate(fx, Xj, calls=4)
    print(f"expm d={d}: pallas {b / dt:.3e}/s, xla {b / dtx:.3e}/s "
          f"({dtx / dt:.1f}x)", flush=True)
    gate(f"expm d={d} nw-vs-xla max", nw.max(), 1e-5)
    del Xj

# logm: kernel route at d <= 24, XLA ISS fallback above
for d, b, kernel in ((20, 50_000, True), (24, 50_000, True),
                     (32, 4_096, False)):
    X = (rng.standard_normal((b, d, d))
         * (0.8 / np.sqrt(d))).astype(np.float32)
    E = jax.jit(lambda x: L.expm(x, backend="pallas" if d <= 32 else "xla")
                )(jnp.asarray(X))
    fl = jax.jit(L.logm)
    t0 = time.time()
    drain(fl(E))
    print(f"logm d={d} ({'kernel' if kernel else 'xla-iss'}): first call "
          f"{time.time() - t0:.0f}s", flush=True)
    back = np.asarray(fl(E[:2048]), np.float64)
    rel = np.abs(back - X[:2048]) / (np.abs(X[:2048]) + 1e-30)
    dt = rate(fl, E, calls=8 if kernel else 2)
    print(f"logm d={d}: {b / dt:.3e}/s", flush=True)
    gate(f"logm d={d} roundtrip med", float(np.median(rel)), 1e-5)
    if not np.isfinite(back).all():
        fail.append(f"logm d={d} non-finite")
    del E

print("LIE32", "FAILED " + ", ".join(fail) if fail else "PASSED", flush=True)
sys.exit(1 if fail else 0)
