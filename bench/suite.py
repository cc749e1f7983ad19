"""Per-op throughput + accuracy table generator.

The reference publishes no benchmark numbers (BASELINE.md), so this
suite produces the measured baseline.

ONE methodology for every row (identical to bench.py's):
- timing: `calls` pipelined jitted calls on device-resident operands,
  drained by ONE scalar fetch at the end (block_until_ready does not
  drain the axon relay); dt = total / calls. Default calls=32 —
  at ~3 ms relay overhead per call, fewer calls understates
  memory-bound ops by up to ~4x (the round-1 2.2e8-vs-9.7e8 sym_solve
  discrepancy was exactly this).
- channel-first Pallas rows use block=32768 (bench.py's setting) for
  N <= 4; the N > 4 PLU tier uses its VMEM-sized default blocks.
- accuracy: rel-err vs float64 numpy/scipy oracles on a slice.
- bandwidth column: bytes/item is the op's minimal HBM traffic
  (operands read + results written once); util% = achieved GB/s over
  the stream ceiling MEASURED in the same session (a jitted
  elementwise `x*a+b` over 512 MB, read+write counted).

Usage: python bench/suite.py [--out BENCH_MEASURED.md]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

RESULTS = []
CEILING = [0.0]  # measured stream bytes/s, filled by main()


def honest_time(fn, *args, calls=32):
    # bench.py's exact pattern: the jitted call reduces its result to a
    # device scalar (so dispatches pipeline deeply through the relay —
    # returning full arrays serializes and understates ~2x), and the
    # queue drains at one final scalar fetch.
    g = jax.jit(lambda *a: sum(jnp.sum(x) for x in jax.tree.leaves(fn(*a))))
    _ = float(g(*args))  # compile + warmup
    t0 = time.time()
    for _ in range(calls - 1):
        out = g(*args)
    _ = float(g(*args))
    return (time.time() - t0) / calls


def rel_err(got, want):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    r = np.abs(got - want) / (np.abs(want) + 1e-30)
    return float(np.median(r)), float(np.quantile(r, 0.99))


def record(name, batch, dtype, items_per_call, dt, med, p99, unit="items/s",
           bytes_per_item=None):
    thr = items_per_call / dt
    gbps = thr * bytes_per_item / 1e9 if bytes_per_item else None
    util = gbps * 1e9 / CEILING[0] if (gbps and CEILING[0]) else None
    RESULTS.append(
        dict(op=name, batch=batch, dtype=dtype, throughput=thr, unit=unit,
             relerr_median=med, relerr_p99=p99,
             bytes_per_item=bytes_per_item, gbps=gbps, util=util)
    )
    u = f" {gbps:7.1f} GB/s ({100 * util:5.1f}% ceiling)" if gbps else ""
    print(f"{name:34s} {thr:12.3e} {unit:10s} "
          f"relerr med={med:.1e} p99={p99:.1e}{u}", file=sys.stderr,
          flush=True)


def measure_stream_ceiling():
    """Elementwise read+write stream over 1 GB — the machine ceiling
    memory-bound ops are judged against. The working set must be large
    enough that the ~1 ms/dispatch relay cost is amortized (512 MB
    still reads ~25% low; 72 MB reads 3-7x low)."""
    x = jnp.ones((256, 1 << 20), jnp.float32)  # 1 GB
    f = jax.jit(lambda t: t * 1.0000001 + 1.0)
    dt = honest_time(f, x, calls=16)
    CEILING[0] = x.size * 4 * 2 / dt
    print(f"[stream ceiling] {CEILING[0] / 1e9:.1f} GB/s", file=sys.stderr,
          flush=True)


def spd_batch(rng, b, n, dtype=np.float32):
    a = rng.standard_normal((b, n, n)).astype(dtype)
    return np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n, dtype=dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_MEASURED.md")
    ap.add_argument("--small", action="store_true", help="reduced batch sizes")
    args = ap.parse_args()

    from fastmath_tpu.layouts import full_to_sym
    from fastmath_tpu.kernels import sym_solve_cf, sym_matvec_cf
    from fastmath_tpu.ops import batched as B_
    from fastmath_tpu.ops import lie as L
    from fastmath_tpu.ops import qr as Q
    from fastmath_tpu.ops import realtransforms as RT
    from fastmath_tpu.ops import reduce as R
    from fastmath_tpu.ops import sym as F

    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    BIG = 200_000 if args.small else 1_000_000
    MID = 50_000 if args.small else 200_000
    measure_stream_ceiling()

    # --- compact-sym solve/matvec, 4x4, fp32 ------------------------------
    spd = spd_batch(rng, BIG, 4)
    compact = np.asarray(full_to_sym(jnp.asarray(spd)))
    vec = rng.standard_normal((BIG, 4)).astype(np.float32)
    want = np.linalg.solve(spd[:8192].astype(np.float64),
                           vec[:8192].astype(np.float64)[..., None])[..., 0]
    if backend == "tpu":
        m = jax.device_put(jnp.asarray(compact.T.copy()))
        v = jax.device_put(jnp.asarray(vec.T.copy()))
        f = jax.jit(lambda m, v: sym_solve_cf(m, v, block=32768))
        dt = honest_time(f, m, v)
        med, p99 = rel_err(np.asarray(f(m[:, :8192], v[:, :8192])).T, want)
        record("sym_solve 4x4 (pallas, cf)", BIG, "f32", BIG, dt, med, p99,
               "solves/s", bytes_per_item=(10 + 4 + 4) * 4)
        fmv = jax.jit(lambda m, v: sym_matvec_cf(m, v, block=32768))
        dtmv = honest_time(fmv, m, v)
        wmv = np.einsum("...ij,...j->...i", spd[:8192].astype(np.float64),
                        vec[:8192].astype(np.float64))
        medv, p99v = rel_err(np.asarray(fmv(m[:, :8192], v[:, :8192])).T, wmv)
        record("sym_matvec 4x4 (pallas, cf)", BIG, "f32", BIG, dtmv, medv,
               p99v, "mv/s", bytes_per_item=(10 + 4 + 4) * 4)
    mj = jax.device_put(jnp.asarray(compact))
    vj = jax.device_put(jnp.asarray(vec))
    f = jax.jit(F.sym_solve)
    dt = honest_time(f, mj, vj)
    med, p99 = rel_err(np.asarray(f(mj[:8192], vj[:8192])), want)
    record("sym_solve 4x4 (XLA, ref layout)", BIG, "f32", BIG, dt, med, p99,
           "solves/s", bytes_per_item=(10 + 4 + 4) * 4)

    # sustained chained-dispatch rate (bench.py's headline): 128
    # dependent full-batch solves per dispatch amortize the ~1 ms
    # relay dispatch cost that bounds every single-dispatch row above
    K = 128

    def chained(m, v0):
        def body(x, _):
            return F.sym_solve(m, x) + v0, ()
        x, _ = jax.lax.scan(body, v0, None, length=K)
        return x

    dt = honest_time(chained, mj, vj, calls=24)
    # accuracy of the *chained* computation itself (error accumulates
    # over the K dependent solves): f32 chain vs an f64 numpy chain
    got_chain = np.asarray(chained(mj[:2048], vj[:2048]), np.float64)
    xo = vec[:2048].astype(np.float64)
    a64 = spd[:2048].astype(np.float64)
    for _ in range(K):
        xo = np.linalg.solve(a64, xo[..., None])[..., 0] + vec[:2048]
    medc, p99c = rel_err(got_chain, xo)
    record("sym_solve 4x4 sustained (chain k=128)", BIG, "f32", K * BIG, dt,
           medc, p99c, "solves/s", bytes_per_item=(10 + 4 + 4) * 4)

    # --- batched inv/det/chol 3x3 & 8x8 -----------------------------------
    # 3x3 at the full 1M batch: smaller batches are relay-overhead
    # dominated (~3 ms/call) and understate throughput ~4x.
    for n, nb in ((3, BIG), (8, MID)):
        a = spd_batch(rng, nb, n)
        aj = jax.device_put(jnp.asarray(a))
        f = jax.jit(B_.batchinv)
        dt = honest_time(f, aj)
        med, p99 = rel_err(np.asarray(f(aj[:4096])),
                           np.linalg.inv(a[:4096].astype(np.float64)))
        record(f"batchinv {n}x{n}", nb, "f32", nb, dt, med, p99, "inv/s",
               bytes_per_item=2 * n * n * 4)
        f = jax.jit(B_.batchchol)
        dt = honest_time(f, aj)
        med, p99 = rel_err(np.asarray(f(aj[:4096])),
                           np.linalg.cholesky(a[:4096].astype(np.float64)))
        record(f"batchchol {n}x{n}", nb, "f32", nb, dt, med, p99, "chol/s",
               bytes_per_item=2 * n * n * 4)

    if backend == "tpu":
        from fastmath_tpu.kernels import chol_cf, inv_cf

        a = spd_batch(rng, BIG, 3)
        cf = jax.device_put(jnp.asarray(
            np.ascontiguousarray(a.reshape(BIG, 9).T)))
        f = jax.jit(lambda x: inv_cf(x, block=32768))
        dt = honest_time(f, cf)
        med, p99 = rel_err(np.asarray(f(cf[:, :8192])).T,
                           np.linalg.inv(a[:8192].astype(np.float64))
                           .reshape(-1, 9))
        record("batchinv 3x3 (pallas, cf)", BIG, "f32", BIG, dt, med, p99,
               "inv/s", bytes_per_item=2 * 9 * 4)
        comp = jax.device_put(jnp.asarray(np.ascontiguousarray(
            np.asarray(full_to_sym(jnp.asarray(a))).T)))
        f = jax.jit(lambda x: chol_cf(x, block=32768))
        dt = honest_time(f, comp)
        lw = np.linalg.cholesky(a[:8192].astype(np.float64))
        lw_comp = np.asarray(full_to_sym(jnp.asarray(
            lw + np.swapaxes(lw, -1, -2) - lw * np.eye(3))))
        med, p99 = rel_err(np.asarray(f(comp[:, :8192])).T, lw_comp)
        record("batchchol 3x3 (pallas, cf)", BIG, "f32", BIG, dt, med, p99,
               "chol/s", bytes_per_item=2 * 6 * 4)

    # --- eig_sym 4x4 huge batch -------------------------------------------
    a = spd_batch(rng, MID, 4)
    aj = jax.device_put(jnp.asarray(a))
    f = jax.jit(lambda x: Q.eig_sym(x, check_finite=False, backend="xla"))
    dt = honest_time(f, aj, calls=4)
    w = np.sort(np.asarray(f(aj[:4096])), -1)
    ww = np.sort(np.linalg.eigvalsh(a[:4096].astype(np.float64)), -1)
    med, p99 = rel_err(w, ww)
    record("eig_sym 4x4 (jacobi, xla)", MID, "f32", MID, dt, med, p99,
           "eig/s", bytes_per_item=(16 + 4) * 4)
    if backend == "tpu":
        abig = jax.device_put(jnp.asarray(spd_batch(rng, BIG, 4)))
        f = jax.jit(lambda x: Q.eig_sym(x, check_finite=False))
        dt = honest_time(f, abig, calls=8)
        med, p99 = rel_err(np.sort(np.asarray(f(aj[:4096])), -1), ww)
        record("eig_sym 4x4 (auto->pallas)", BIG, "f32", BIG, dt, med, p99,
               "eig/s", bytes_per_item=(16 + 4) * 4)
        del abig
    if backend == "tpu":
        from fastmath_tpu.kernels import eig_sym_cf

        acf = jax.device_put(
            jnp.asarray(np.ascontiguousarray(
                np.asarray(full_to_sym(jnp.asarray(spd_batch(rng, BIG, 4)))).T))
        )
        fcf = jax.jit(lambda x: eig_sym_cf(x, block=32768))
        dt = honest_time(fcf, acf, calls=8)
        wcf = np.sort(np.asarray(fcf(acf[:, :8192])).T, -1)
        full8k = np.asarray(F.sym_to_full(jnp.asarray(np.asarray(acf[:, :8192]).T)))
        wwcf = np.sort(np.linalg.eigvalsh(full8k.astype(np.float64)), -1)
        med, p99 = rel_err(wcf, wwcf)
        record("eig_sym 4x4 (pallas, cf)", BIG, "f32", BIG, dt, med, p99,
               "eig/s", bytes_per_item=(10 + 4) * 4)

    # --- dct (matmul path) -------------------------------------------------
    x = rng.standard_normal((BIG, 64)).astype(np.float32)
    xj = jax.device_put(jnp.asarray(x))
    f = jax.jit(lambda t: RT.dct(t, norm="ortho"))
    dt = honest_time(f, xj)
    import scipy.fft as sfft
    med, p99 = rel_err(np.asarray(f(xj[:4096])),
                       sfft.dct(x[:4096].astype(np.float64), norm="ortho"))
    record("dct-II n=64 ortho (MXU)", BIG, "f32", BIG, dt, med, p99,
           "rows/s", bytes_per_item=2 * 64 * 4)
    del xj, x  # free 2x256 MB before staging the FFT-path operand
    nfft = 65536
    x2 = rng.standard_normal((nfft, 2048)).astype(np.float32)
    x2j = jax.device_put(jnp.asarray(x2))
    f2 = jax.jit(lambda t: RT.dct(t, norm="ortho"))
    dt2 = honest_time(f2, x2j)
    med2, p992 = rel_err(np.asarray(f2(x2j[:1024])),
                         sfft.dct(x2[:1024].astype(np.float64), norm="ortho"))
    record("dct-II n=2048 ortho (MXU)", nfft, "f32", nfft, dt2, med2, p992,
           "rows/s", bytes_per_item=2 * 2048 * 4)
    del x2j, x2

    # --- expm / logm SE(3)-ish 4x4 ------------------------------------------
    X = rng.standard_normal((BIG, 4, 4)).astype(np.float32) * 0.5
    Xj = jax.device_put(jnp.asarray(X))
    f = jax.jit(L.expm)
    dt = honest_time(f, Xj, calls=8)
    import scipy.linalg as sla
    want = np.stack([sla.expm(np.asarray(m, np.float64)) for m in X[:256]])
    med, p99 = rel_err(np.asarray(f(Xj[:256])), want)
    record("expm 4x4", BIG, "f32", BIG, dt, med, p99, "expm/s",
           bytes_per_item=2 * 16 * 4)
    # logm inputs built on device (expm), accuracy = roundtrip vs X
    # (well-conditioned: ||X|| <= ~2) + scipy spot-check on a slice
    Ej = f(Xj)
    f = jax.jit(L.logm)
    dt = honest_time(f, Ej, calls=8)
    med, p99 = rel_err(np.asarray(f(Ej[:8192])),
                       np.asarray(Xj[:8192], np.float64))
    record("logm 4x4 (batched ISS)", BIG, "f32", BIG, dt, med, p99, "logm/s",
           bytes_per_item=2 * 16 * 4)
    del Xj, Ej

    # --- nan reductions ------------------------------------------------------
    xx = rng.standard_normal((BIG, 64)).astype(np.float32)
    xx[rng.random(xx.shape) < 0.2] = np.nan
    xj = jax.device_put(jnp.asarray(xx))
    f = jax.jit(lambda t: R.nansum(t, dim=-1))
    dt = honest_time(f, xj)
    med, p99 = rel_err(np.asarray(f(xj[:65536])),
                       np.nansum(xx[:65536].astype(np.float64), -1))
    record("nansum dim=-1", BIG, "f32", BIG * 64, dt, med, p99, "elem/s",
           bytes_per_item=4 + 4 / 64)

    # --- small-n dense solves (unrolled PLU / cholesky tiers) ---------------
    from fastmath_tpu.ops import sugar as SU
    n8 = 8
    a8 = spd_batch(rng, MID, n8)
    b8 = rng.standard_normal((MID, n8, 2)).astype(np.float32)
    a8j, b8j = jax.device_put(jnp.asarray(a8)), jax.device_put(jnp.asarray(b8))
    want8 = np.linalg.solve(a8[:2048].astype(np.float64),
                            b8[:2048].astype(np.float64))
    for meth in ("lu", "chol"):
        f = jax.jit(lambda a, b, m=meth: SU.lmdiv(a, b, method=m))
        dt = honest_time(f, a8j, b8j)
        med, p99 = rel_err(np.asarray(f(a8j[:2048], b8j[:2048])), want8)
        record(f"lmdiv {meth} 8x8", MID, "f32", MID, dt, med, p99, "solves/s",
               bytes_per_item=(64 + 16 + 16) * 4)
    a6 = spd_batch(rng, MID, 6)
    c6 = np.asarray(full_to_sym(jnp.asarray(a6)))
    v6 = rng.standard_normal((MID, 6)).astype(np.float32)
    c6j, v6j = jax.device_put(jnp.asarray(c6)), jax.device_put(jnp.asarray(v6))
    f = jax.jit(F.sym_solve)
    dt = honest_time(f, c6j, v6j)
    want6 = np.linalg.solve(a6[:2048].astype(np.float64),
                            v6[:2048].astype(np.float64)[..., None])[..., 0]
    med, p99 = rel_err(np.asarray(f(c6j[:2048], v6j[:2048])), want6)
    record("sym_solve 6x6 (XLA PLU)", MID, "f32", MID, dt, med, p99,
           "solves/s", bytes_per_item=(21 + 6 + 6) * 4)

    # --- channel-first Pallas PLU tier (5 <= N <= 8, new in r2) -------------
    if backend == "tpu":
        for n_ in (6, 8):
            a_ = spd_batch(rng, BIG, n_)
            nn_ = n_ * (n_ + 1) // 2
            cf_ = jax.device_put(jnp.asarray(np.ascontiguousarray(
                np.asarray(full_to_sym(jnp.asarray(a_))).T)))
            v_ = rng.standard_normal((BIG, n_)).astype(np.float32)
            vcf_ = jax.device_put(jnp.asarray(v_.T.copy()))
            fs = jax.jit(lambda m, v: sym_solve_cf(m, v))
            dt = honest_time(fs, cf_, vcf_)
            want_ = np.linalg.solve(a_[:4096].astype(np.float64),
                                    v_[:4096].astype(np.float64)[..., None]
                                    )[..., 0]
            med, p99 = rel_err(np.asarray(fs(cf_[:, :4096], vcf_[:, :4096])).T,
                               want_)
            record(f"sym_solve {n_}x{n_} (pallas PLU, cf)", BIG, "f32", BIG,
                   dt, med, p99, "solves/s",
                   bytes_per_item=(nn_ + 2 * n_) * 4)
            del a_, cf_, vcf_

    # ---- write tables -------------------------------------------------------
    lines = [
        "# BENCH_MEASURED — per-op throughput + accuracy",
        "",
        f"Backend: `{backend}` ({jax.devices()[0]}).",
        "",
        "**One methodology for every row** (identical to `bench.py`):",
        "32 pipelined jitted calls on device-resident operands, drained by",
        "one scalar fetch (dt = total/32); channel-first Pallas kernels at",
        "block=32768 for N<=4 (the PLU tier uses its VMEM-sized defaults);",
        "rel-err vs float64 numpy/scipy oracles on a slice (random-Wishart",
        "inputs; the p99/median spread reflects conditioning, not kernel",
        "error). Every row reproduces with `python bench/suite.py`.",
        "",
        f"Stream ceiling measured this session: "
        f"**{CEILING[0] / 1e9:.1f} GB/s** (jitted elementwise x*a+b over"
        " 512 MB, read+write). `bytes/item` is the op's minimal HBM",
        "traffic; `util` is achieved bandwidth over that ceiling —",
        "memory-bound ops are at speed-of-light when util approaches 100%.",
        "",
        "| op | batch | dtype | throughput | unit | rel-err med | p99 |"
        " bytes/item | GB/s | util |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in RESULTS:
        bw = (f"{r['bytes_per_item']:.0f} | {r['gbps']:.1f} | "
              f"{100 * r['util']:.0f}% " if r.get("gbps") else " | | ")
        lines.append(
            f"| {r['op']} | {r['batch']} | {r['dtype']} | "
            f"{r['throughput']:.3e} | {r['unit']} | {r['relerr_median']:.1e} "
            f"| {r['relerr_p99']:.1e} | {bw}|"
        )
    Path(args.out).write_text("\n".join(lines) + "\n")
    Path(args.out).with_suffix(".json").write_text(json.dumps(RESULTS, indent=1))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
