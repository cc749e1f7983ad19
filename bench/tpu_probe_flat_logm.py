"""TPU probe: flat-loop logm kernel at 24 < d <= 32 (round 5).

Measures Mosaic compile time, correctness vs an expm roundtrip, and
sustained throughput vs the XLA ISS tier (the BENCH_MEASURED non-normal
logm 28/32 rows: 4.6-5.3e3 logm/s at b=8192).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    print(f"devices: {jax.devices()}", flush=True)
    from fastmath_tpu.kernels.logm_pallas import logm_cf
    from fastmath_tpu.ops.lie import _expm_core, _iss_log_core

    rng = np.random.default_rng(0)
    X = (rng.standard_normal((b, d, d)) * (0.4 / np.sqrt(d))).astype(
        np.float32)
    E = np.asarray(_expm_core(jnp.asarray(X)))
    print("asym check:", np.abs(E - np.swapaxes(E, -1, -2)).max(), flush=True)
    cf = jnp.asarray(np.ascontiguousarray(E.reshape(-1, d * d).T))

    fn = jax.jit(lambda m: logm_cf(m, bm=True))
    t0 = time.time()
    out = fn(cf)
    drain = float(jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)))
    t1 = time.time()
    print(f"first call (compile+load+run): {t1 - t0:.1f} s", flush=True)

    got = np.asarray(out).T.reshape(b, d, d)
    finite = np.isfinite(got).all(axis=(-2, -1))
    print(f"finite lanes: {finite.sum()}/{b}", flush=True)
    nw = (np.linalg.norm((got - X).reshape(b, -1), axis=-1)
          / np.linalg.norm(X.reshape(b, -1), axis=-1))
    print(f"roundtrip nw med {np.median(nw):.2e} max {nw.max():.2e}",
          flush=True)

    # sustained: pipelined dependent-ish dispatches with scalar drain
    ncall = 24
    outs = [fn(cf) for _ in range(4)]  # warm pipeline
    _ = float(jnp.sum(outs[-1]))
    t0 = time.time()
    outs = [fn(cf) for _ in range(ncall)]
    _ = [float(jnp.sum(o)) for o in outs[-1:]]
    dt = time.time() - t0
    rate = ncall * b / dt
    print(f"flat kernel: {rate:.3e} logm/s  ({dt/ncall*1e3:.2f} ms/call)",
          flush=True)

    # XLA ISS tier for reference
    fx = jax.jit(lambda m: _iss_log_core(m)[0])
    ex = jnp.asarray(E)
    o = fx(ex)
    _ = float(jnp.sum(jnp.where(jnp.isfinite(o), o, 0.0)))
    nx = 4
    t0 = time.time()
    outs = [fx(ex) for _ in range(nx)]
    _ = [float(jnp.sum(jnp.where(jnp.isfinite(o), o, 0.0)))
         for o in outs[-1:]]
    dt = time.time() - t0
    print(f"XLA ISS:    {nx * b / dt:.3e} logm/s", flush=True)


if __name__ == "__main__":
    main()
