"""Hardware validation + measurement of the rolled tier at 17 <= n <= 32.

Run on the real TPU (axon backend registers automatically):

    python bench/tpu_probe_rolled32.py

Covers every rolled-capable kernel family past the BASELINE <=16x16
gate (the reference's jitfields kernels had no N cap — reference
``sym.py:28-37``): batchinv / batchlogdet / sym_solve / sym_solve_chain
/ sym_maxeig / sym_matvec_chain / eig_sym (values + vectors), all
through the public routed API, against f64 numpy oracles.

Accuracy gates are normwise (solves/inverses) or relative (scalars);
``sym_maxeig`` gates on the median because power iteration's tail is
intrinsically gap-limited (p99 at iters=64 is ~1e-2 for near-degenerate
Wishart lanes — convergence is O((lambda2/lambda1)^iters), documented).
An earlier in-round probe misread maxeig as failing by indexing
``mu[..., 0]`` on the 1-D eigenvalue output — comparing lane 0 against
every oracle measures the cross-lane Tracy-Widom spread, not error.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastmath_tpu.layouts import full_to_sym  # noqa: E402
from fastmath_tpu.ops import batched as B  # noqa: E402
from fastmath_tpu.ops import sym as S  # noqa: E402
from fastmath_tpu.ops import qr as Q  # noqa: E402

print("backend:", jax.default_backend(), jax.devices(), flush=True)
rng = np.random.default_rng(0)
fail = []


def drain(x):
    return float(jnp.sum(x))


def rate(f, *a, calls=16):
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


for n, b in ((24, 200_000), (32, 100_000)):
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    spd = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(
        n, dtype=np.float32)
    A = jax.device_put(jnp.asarray(spd))
    spd64 = spd[:2048].astype(np.float64)

    fp = jax.jit(lambda x: B.batchinv(x, backend="pallas"))
    t0 = time.time()
    drain(fp(A))
    print(f"batchinv n={n}: first call {time.time() - t0:.0f}s", flush=True)
    got = np.asarray(fp(A[:2048]), np.float64)
    want = np.linalg.inv(spd64)
    nw = (np.linalg.norm(got - want, axis=(-2, -1))
          / np.linalg.norm(want, axis=(-2, -1)))
    dt = rate(fp, A)
    dtx = rate(jax.jit(lambda x: B.batchinv(x, backend="xla")), A, calls=4)
    print(f"batchinv n={n}: pallas {b / dt:.3e}/s, xla {b / dtx:.3e}/s "
          f"({dtx / dt:.1f}x)", flush=True)
    gate(f"inv n={n} nw max", nw.max(), 1e-5)

    fl = jax.jit(lambda x: B.batchlogdet(x, backend="pallas"))
    got = np.asarray(fl(A[:2048]), np.float64)
    wld = np.linalg.slogdet(spd64)[1]
    dt = rate(fl, A)
    dtx = rate(jax.jit(lambda x: B.batchlogdet(x, backend="xla")), A, calls=4)
    print(f"batchlogdet n={n}: pallas {b / dt:.3e}/s, xla {b / dtx:.3e}/s "
          f"({dtx / dt:.1f}x)", flush=True)
    gate(f"logdet n={n} relerr", np.abs(got - wld).max() / np.abs(wld).max(),
         1e-5)

    fch = jax.jit(lambda x: B.batchchol(x, backend="pallas"))
    got = np.asarray(fch(A[:2048]), np.float64)
    wch = np.linalg.cholesky(spd64)
    nwl = (np.linalg.norm(got - wch, axis=(-2, -1))
           / np.linalg.norm(wch, axis=(-2, -1)))
    dt = rate(fch, A)
    dtx = rate(jax.jit(lambda x: B.batchchol(x, backend="xla")), A, calls=4)
    print(f"batchchol n={n}: pallas {b / dt:.3e}/s, xla {b / dtx:.3e}/s "
          f"({dtx / dt:.1f}x)", flush=True)
    gate(f"chol n={n} nw max", nwl.max(), 1e-5)

    cm = jax.device_put(jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd)))))
    v = jax.device_put(
        jnp.asarray(rng.standard_normal((b, n)).astype(np.float32)))
    v64 = np.asarray(v[:2048], np.float64)

    fs = jax.jit(lambda m, w: S.sym_solve(m, w, backend="pallas"))
    got = np.asarray(fs(cm[:2048], v[:2048]), np.float64)
    wx = np.linalg.solve(spd64, v64[..., None])[..., 0]
    nws = np.linalg.norm(got - wx, axis=-1) / np.linalg.norm(wx, axis=-1)
    dt = rate(fs, cm, v)
    dtx = rate(jax.jit(lambda m, w: S.sym_solve(m, w, backend="xla")), cm, v,
               calls=4)
    print(f"sym_solve n={n}: pallas {b / dt:.3e}/s, xla {b / dtx:.3e}/s "
          f"({dtx / dt:.1f}x)", flush=True)
    gate(f"solve n={n} nw max", nws.max(), 1e-5)

    fc = jax.jit(lambda m, w: S.sym_solve_chain(m, w, iters=16, add=w,
                                                backend="pallas"))
    dt = rate(fc, cm, v)
    got = np.asarray(fc(cm[:2048], v[:2048]), np.float64)
    xs = v64.copy()
    for _ in range(16):
        xs = np.linalg.solve(spd64, xs[..., None])[..., 0] + v64
    nwc = np.linalg.norm(got - xs, axis=-1) / np.linalg.norm(xs, axis=-1)
    print(f"solve_chain n={n} k=16: {b * 16 / dt:.3e} solves/s", flush=True)
    gate(f"chain n={n} nw max", nwc.max(), 1e-4)

    fmc = jax.jit(lambda m, w: S.sym_matvec_chain(m, w, iters=16, add=w,
                                                  backend="pallas"))
    cms = cm * np.float32(0.5 / n)  # contractive: keeps the chain in range
    dt = rate(fmc, cms, v)
    got = np.asarray(fmc(cms[:2048], v[:2048]), np.float64)
    ys = v64.copy()
    a64 = (0.5 / n) * spd64
    for _ in range(16):
        ys = (a64 @ ys[..., None])[..., 0] + v64
    nwm = np.linalg.norm(got - ys, axis=-1) / np.linalg.norm(ys, axis=-1)
    print(f"matvec_chain n={n} k=16: {b * 16 / dt:.3e} mv/s", flush=True)
    gate(f"mvchain n={n} nw max", nwm.max(), 1e-4)

    fm = jax.jit(lambda m: S.sym_maxeig(m, iters=64, backend="pallas"))
    dt = rate(fm, cm)
    mu = np.asarray(fm(cm[:2048]), np.float64)
    wmax = np.linalg.eigvalsh(spd64)[:, -1]
    print(f"sym_maxeig n={n} iters=64: {b / dt:.3e} eig/s", flush=True)
    gate(f"maxeig n={n} med", np.median(np.abs(mu - wmax) / wmax), 1e-5)
    del A, cm, cms, v

# eig (smaller batches: O(n^3 * sweeps) per matrix)
for n, b in ((24, 100_000), (32, 50_000)):
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    spd = np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(
        n, dtype=np.float32)
    A = jax.device_put(jnp.asarray(spd))
    fe = jax.jit(lambda x: Q.eig_sym(x, check_finite=False,
                                     backend="pallas"))
    t0 = time.time()
    drain(fe(A))
    print(f"eig n={n}: first call {time.time() - t0:.0f}s", flush=True)
    got = np.sort(np.asarray(fe(A[:2048]), np.float64), -1)
    ww = np.sort(np.linalg.eigvalsh(spd[:2048].astype(np.float64)), -1)
    dt = rate(fe, A, calls=8)
    print(f"eig_sym n={n}: pallas {b / dt:.3e} eig/s", flush=True)
    gate(f"eig n={n} relerr", np.abs(got - ww).max() / np.abs(ww).max(), 1e-5)
    if n == 32:
        fu = jax.jit(lambda x: Q.eig_sym(x, compute_u=True,
                                         check_finite=False,
                                         backend="pallas"))
        w2, u2 = fu(A[:2048])
        w2 = np.asarray(w2, np.float64)
        u2 = np.asarray(u2, np.float64)
        recon = np.einsum("bij,bj,bkj->bik", u2, w2, u2)
        r = np.abs(recon - spd[:2048]).max() / np.abs(spd[:2048]).max()
        gate("eig n=32 vectors recon", r, 1e-3)
    del A

print("ROLLED32", "FAILED " + ", ".join(fail) if fail else "PASSED",
      flush=True)
sys.exit(1 if fail else 0)
