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
- every kernel family ALSO gets a **sustained** row (`chain k=K`):
  K dependent full-batch applications per dispatch via lax.scan, the
  dispatch-amortized rate an iterative production workload sees
  (single-dispatch rows at <= 100 MB working sets are bounded by the
  ~1 ms non-overlappable relay dispatch cost, not by the op — they
  understate 2-7x; CLAUDE.md round-2 perf model).
- accuracy: rel-err vs float64 numpy/scipy oracles on a slice; solves
  additionally report normwise ||x-x*||/||x*|| (the standard solve
  criterion; elementwise max is a near-zero-component artifact).
- bandwidth column: bytes/item is the op's minimal HBM traffic
  (operands read + results written once); util% = achieved GB/s over
  the stream ceiling MEASURED in the same session. Compute-bound rows
  (dct) instead report achieved TFLOP/s against the MXU matmul
  ceiling measured in the same session — judging them by the DMA
  ceiling reads as idle when they are at the FLOP roofline.

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
CEILING = [0.0]      # measured stream bytes/s, filled by main()
MXU_CEILING = [0.0]  # measured default-precision matmul flop/s (bf16-class)
MXU_CEILING_HI = [0.0]  # measured precision="highest" (full-f32) matmul flop/s


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


def chained_time(step, *args, k=64, calls=16):
    """Sustained (dispatch-amortized) timing: one jitted call runs ``k``
    *dependent* full-batch applications of ``step(state, *args)`` via
    lax.scan (nothing can be elided — each iteration's input is the
    previous output), pipelined `calls` times, drained by one scalar
    fetch. Returns seconds per single application."""

    def run(*a):
        def body(x, _):
            return step(x, *a[1:]), ()

        x, _ = jax.lax.scan(body, a[0], None, length=k)
        return jnp.sum(jax.tree.leaves(x)[0] if isinstance(x, (tuple, list))
                       else x)

    g = jax.jit(run)
    _ = float(g(*args))
    t0 = time.time()
    for _ in range(calls - 1):
        out = g(*args)
    _ = float(g(*args))
    return (time.time() - t0) / (calls * k)


def rel_err(got, want):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    r = np.abs(got - want) / (np.abs(want) + 1e-30)
    return float(np.median(r)), float(np.quantile(r, 0.99))


def normwise(got, want):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    nw = np.linalg.norm(got - want, axis=-1) / np.linalg.norm(want, axis=-1)
    return float(np.max(nw))


def record(name, batch, dtype, items_per_call, dt, med, p99, unit="items/s",
           bytes_per_item=None, flops_per_item=None, nw_max=None,
           mxu_hi=False, bound=None):
    """``mxu_hi``: judge the FLOP column against the precision="highest"
    matmul ceiling (the roofline an f32-contract MXU op can actually
    reach) instead of the default-precision (bf16-class) one.

    ``bound``: the row's binding resource tag — "dispatch" / "DMA" /
    "VPU" / "MXU". When not given it is derived mechanically from the
    measured ceilings: >= 40% of the stream ceiling -> DMA-bound;
    >= 40% of the MXU ceiling -> MXU-bound; a single-dispatch call
    whose whole wall time is within ~4x of the ~1 ms relay dispatch
    cost -> dispatch-bound; otherwise the op is arithmetic-bound on
    the VPU (register kernels / fused elementwise). The tag explains
    table "anomalies" like sustained == single-dispatch rows: a
    VPU-bound op gains nothing from dispatch amortization."""
    thr = items_per_call / dt
    gbps = thr * bytes_per_item / 1e9 if bytes_per_item else None
    util = gbps * 1e9 / CEILING[0] if (gbps and CEILING[0]) else None
    tflops = thr * flops_per_item / 1e12 if flops_per_item else None
    mceil = MXU_CEILING_HI[0] if mxu_hi else MXU_CEILING[0]
    mxu = tflops * 1e12 / mceil if (tflops and mceil) else None
    if bound is None:
        if util is not None and util >= 0.4:
            bound = "DMA"
        elif mxu is not None and mxu >= 0.4:
            bound = "MXU"
        elif dt < 0.004:
            bound = "dispatch"
        else:
            bound = "VPU"
    RESULTS.append(
        dict(op=name, batch=batch, dtype=dtype, throughput=thr, unit=unit,
             relerr_median=med, relerr_p99=p99, normwise_max=nw_max,
             bytes_per_item=bytes_per_item, gbps=gbps, util=util,
             tflops=tflops, mxu_util=mxu, bound=bound)
    )
    u = f" {gbps:7.1f} GB/s ({100 * util:5.1f}% ceiling)" if gbps else ""
    if tflops:
        u += f" {tflops:6.1f} TFLOP/s ({100 * mxu:5.1f}% MXU)"
    if nw_max is not None:
        u += f" nw_max={nw_max:.1e}"
    u += f" [{bound}]"
    # med/p99 = None marks a timing-only row (no oracle was run for
    # this exact computation — never copy another row's accuracy)
    acc = (f"relerr med={med:.1e} p99={p99:.1e}"
           if med is not None else "relerr (timing-only row)")
    print(f"{name:40s} {thr:12.3e} {unit:10s} {acc}{u}", file=sys.stderr,
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
    del x


def measure_mxu_ceiling():
    """Matmul rooflines measured the same way (4096^3 GEMM chained so
    dispatch cost amortizes), at BOTH precisions: the default
    (bf16-input passes) ceiling, and the precision="highest" (full-f32
    passes, ~4x slower) ceiling that f32-contract ops like the dct
    basis matmul are actually bounded by — judging an f32 row by the
    bf16-class number misreads speed-of-light as ~25% idle (round-2
    VERDICT weak-item 3, extended)."""
    n = 4096
    a = jnp.ones((n, n), jnp.float32) * 1e-3
    dt = chained_time(lambda x, b: x @ b * 1e-3, a, a, k=16, calls=8)
    MXU_CEILING[0] = 2 * n**3 / dt
    dth = chained_time(
        lambda x, b: jnp.matmul(x, b, precision="highest") * 1e-3,
        a, a, k=16, calls=8)
    MXU_CEILING_HI[0] = 2 * n**3 / dth
    print(f"[mxu ceiling] default {MXU_CEILING[0] / 1e12:.1f} TFLOP/s, "
          f"highest {MXU_CEILING_HI[0] / 1e12:.1f} TFLOP/s",
          file=sys.stderr, flush=True)
    del a


def spd_batch(rng, b, n, dtype=np.float32):
    a = rng.standard_normal((b, n, n)).astype(dtype)
    return np.einsum("...ij,...kj->...ik", a, a) + n * np.eye(n, dtype=dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_MEASURED.md")
    ap.add_argument("--small", action="store_true", help="reduced batch sizes")
    ap.add_argument("--section", default="all",
                    help="comma-set of {sym,chain,batched,gate16,rolled32,"
                         "eig,dct,lie,reduce,solve8,bf16,maxeig,misc,"
                         "families}")
    args = ap.parse_args()
    sections = set(args.section.split(","))

    def on(s):
        return "all" in sections or s in sections

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
    measure_mxu_ceiling()
    import scipy.fft as sfft
    import scipy.linalg as sla

    # --- compact-sym solve/matvec, 4x4, fp32 ------------------------------
    if on("sym"):
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
            got = np.asarray(f(m[:, :8192], v[:, :8192])).T
            med, p99 = rel_err(got, want)
            record("sym_solve 4x4 (pallas, cf)", BIG, "f32", BIG, dt, med,
                   p99, "solves/s", bytes_per_item=(10 + 4 + 4) * 4,
                   nw_max=normwise(got, want))
            fmv = jax.jit(lambda m, v: sym_matvec_cf(m, v, block=32768))
            dtmv = honest_time(fmv, m, v)
            wmv = np.einsum("...ij,...j->...i", spd[:8192].astype(np.float64),
                            vec[:8192].astype(np.float64))
            medv, p99v = rel_err(np.asarray(fmv(m[:, :8192], v[:, :8192])).T,
                                 wmv)
            record("sym_matvec 4x4 (pallas, cf)", BIG, "f32", BIG, dtmv, medv,
                   p99v, "mv/s", bytes_per_item=(10 + 4 + 4) * 4)
            del m, v
        mj = jax.device_put(jnp.asarray(compact))
        vj = jax.device_put(jnp.asarray(vec))
        f = jax.jit(F.sym_solve)
        dt = honest_time(f, mj, vj)
        got = np.asarray(f(mj[:8192], vj[:8192]))
        med, p99 = rel_err(got, want)
        record("sym_solve 4x4 (public, XLA)", BIG, "f32", BIG, dt, med, p99,
               "solves/s", bytes_per_item=(10 + 4 + 4) * 4,
               nw_max=normwise(got, want))

        # sustained chained-dispatch rate (bench.py's headline)
        dt = chained_time(lambda x, m, v0: F.sym_solve(m, x) + v0,
                          vj, mj, vj, k=128, calls=24)
        got_chain = np.asarray(jax.jit(
            lambda m, v0: jax.lax.scan(
                lambda x, _: (F.sym_solve(m, x) + v0, ()), v0, None,
                length=128)[0])(mj[:2048], vj[:2048]), np.float64)
        xo = vec[:2048].astype(np.float64)
        a64 = spd[:2048].astype(np.float64)
        for _ in range(128):
            xo = np.linalg.solve(a64, xo[..., None])[..., 0] + vec[:2048]
        medc, p99c = rel_err(got_chain, xo)
        record("sym_solve 4x4 sustained (chain k=128)", BIG, "f32", BIG, dt,
               medc, p99c, "solves/s", bytes_per_item=(10 + 4 + 4) * 4)
        del spd, compact, vec, mj, vj

    # --- compact-sym solve 6x6 / 8x8: public routed vs cf kernel ----------
    if on("solve8"):
        for n_ in (6, 8):
            a_ = spd_batch(rng, BIG, n_)
            nn_ = n_ * (n_ + 1) // 2
            c_ = np.asarray(full_to_sym(jnp.asarray(a_)))
            v_ = rng.standard_normal((BIG, n_)).astype(np.float32)
            want_ = np.linalg.solve(a_[:4096].astype(np.float64),
                                    v_[:4096].astype(np.float64)[..., None]
                                    )[..., 0]
            bpi = (nn_ + 2 * n_) * 4
            # public batch-major layout, auto routing (pallas on TPU)
            cj = jax.device_put(jnp.asarray(c_))
            vj = jax.device_put(jnp.asarray(v_))
            f = jax.jit(F.sym_solve)
            dt = honest_time(f, cj, vj)
            got = np.asarray(f(cj[:4096], vj[:4096]))
            med, p99 = rel_err(got, want_)
            record(f"sym_solve {n_}x{n_} (public, auto)", BIG, "f32", BIG,
                   dt, med, p99, "solves/s", bytes_per_item=bpi,
                   nw_max=normwise(got, want_))
            dt = chained_time(lambda x, m, v0: F.sym_solve(m, x) + v0,
                              vj, cj, vj, k=32, calls=8)
            got_c = np.asarray(jax.jit(
                lambda m, v0: jax.lax.scan(
                    lambda x, _: (F.sym_solve(m, x) + v0, ()), v0, None,
                    length=32)[0])(cj[:2048], vj[:2048]), np.float64)
            xo_ = v_[:2048].astype(np.float64)
            a64_ = a_[:2048].astype(np.float64)
            for _ in range(32):
                xo_ = (np.linalg.solve(a64_, xo_[..., None])[..., 0]
                       + v_[:2048])
            medc_, p99c_ = rel_err(got_c, xo_)
            record(f"sym_solve {n_}x{n_} sustained (chain k=32)", BIG,
                   "f32", BIG, dt, medc_, p99c_, "solves/s",
                   bytes_per_item=bpi)
            forced = jax.jit(lambda m, v: F.sym_solve(m, v, backend="xla"))
            dtx = honest_time(forced, cj, vj, calls=8)
            medx, p99x = rel_err(np.asarray(forced(cj[:4096], vj[:4096])),
                                 want_)
            record(f"sym_solve {n_}x{n_} (public, XLA PLU)", BIG, "f32",
                   BIG, dtx, medx, p99x, "solves/s", bytes_per_item=bpi)
            del cj, vj
            if backend == "tpu":
                # channel-first-resident kernel row (the routing target)
                cf_ = jax.device_put(jnp.asarray(
                    np.ascontiguousarray(c_.T)))
                vcf_ = jax.device_put(jnp.asarray(v_.T.copy()))
                fs = jax.jit(lambda m, v: sym_solve_cf(m, v))
                dt = honest_time(fs, cf_, vcf_)
                med, p99 = rel_err(
                    np.asarray(fs(cf_[:, :4096], vcf_[:, :4096])).T, want_)
                record(f"sym_solve {n_}x{n_} (pallas PLU, cf)", BIG, "f32",
                       BIG, dt, med, p99, "solves/s", bytes_per_item=bpi)
                del cf_, vcf_
            del a_, c_, v_

    # --- fused-iteration chain kernel (sym_solve_chain) --------------------
    if on("chain"):
        for n_, kk in ((4, 128), (6, 32), (8, 32), (16, 32)):
            a_ = spd_batch(rng, BIG, n_)
            c_ = np.asarray(full_to_sym(jnp.asarray(a_)))
            v_ = rng.standard_normal((BIG, n_)).astype(np.float32)
            cj = jax.device_put(jnp.asarray(c_))
            vj = jax.device_put(jnp.asarray(v_))
            # full 32-call pipelining (the documented methodology):
            # at 8 calls the pipeline fill/drain of the ~ms relay
            # dispatch understated the 4x4 fused row ~2x vs bench.py
            f = jax.jit(lambda m, v, k=kk: F.sym_solve_chain(m, v, k, add=v))
            dt = honest_time(f, cj, vj, calls=32 if n_ <= 8 else 8)
            # oracle: the same kk-step recurrence in f64
            xo = v_[:2048].astype(np.float64)
            a64 = a_[:2048].astype(np.float64)
            for _ in range(kk):
                xo = (np.linalg.solve(a64, xo[..., None])[..., 0]
                      + v_[:2048].astype(np.float64))
            got = np.asarray(f(cj[:2048], vj[:2048]), np.float64)
            med, p99 = rel_err(got, xo)
            record(f"sym_solve {n_}x{n_} fused chain (k={kk}, pallas)",
                   BIG, "f32", kk * BIG, dt, med, p99, "solves/s",
                   bytes_per_item=(n_ * (n_ + 1) // 2 + 2 * n_) * 4 / kk,
                   nw_max=normwise(got, xo))
            # fused matvec chain (Richardson/Neumann) on the same
            # shapes: contraction-scaled A so the recurrence converges
            sc = np.float32(1.0 / (6 * n_))
            cjs = cj * sc
            fmv = jax.jit(
                lambda m, v, k=kk: F.sym_matvec_chain(m, v, k, add=v))
            dtm = honest_time(fmv, cjs, vj, calls=32 if n_ <= 8 else 8)
            xm = v_[:2048].astype(np.float64)
            a64s = a64 * float(sc)
            for _ in range(kk):
                xm = (np.einsum("bij,bj->bi", a64s, xm)
                      + v_[:2048].astype(np.float64))
            gotm = np.asarray(fmv(cjs[:2048], vj[:2048]), np.float64)
            medm, p99m = rel_err(gotm, xm)
            record(f"sym_matvec {n_}x{n_} fused chain (k={kk}, pallas)",
                   BIG, "f32", kk * BIG, dtm, medm, p99m, "mv/s",
                   bytes_per_item=(n_ * (n_ + 1) // 2 + 2 * n_) * 4 / kk,
                   nw_max=normwise(gotm, xm))
            del a_, c_, v_, cj, cjs, vj

    # --- batched inv/det/chol 3x3 & 8x8 (public, auto-routed) -------------
    if on("batched"):
        for n, nb in ((3, BIG), (8, BIG)):
            a = spd_batch(rng, nb, n)
            aj = jax.device_put(jnp.asarray(a))
            inv_want = np.linalg.inv(a[:4096].astype(np.float64))
            f = jax.jit(B_.batchinv)
            dt = honest_time(f, aj)
            med, p99 = rel_err(np.asarray(f(aj[:4096])), inv_want)
            record(f"batchinv {n}x{n} (public, auto)", nb, "f32", nb, dt,
                   med, p99, "inv/s", bytes_per_item=2 * n * n * 4)
            dt = chained_time(
                lambda x, a0: B_.batchinv(x) * 0.5 + a0, aj, aj,
                k=32, calls=8)
            got_c = np.asarray(jax.jit(
                lambda a0: jax.lax.scan(
                    lambda x, _: (B_.batchinv(x) * 0.5 + a0, ()), a0,
                    None, length=32)[0])(aj[:2048]), np.float64)
            xo_ = a[:2048].astype(np.float64)
            for _ in range(32):
                xo_ = np.linalg.inv(xo_) * 0.5 + a[:2048]
            medc_, p99c_ = rel_err(got_c, xo_)
            record(f"batchinv {n}x{n} sustained (chain k=32)", nb, "f32",
                   nb, dt, medc_, p99c_, "inv/s",
                   bytes_per_item=2 * n * n * 4)
            if n > 4:
                fx = jax.jit(lambda t: B_.batchinv(t, backend="xla"))
                dtx = honest_time(fx, aj, calls=8)
                medx, p99x = rel_err(np.asarray(fx(aj[:4096])), inv_want)
                record(f"batchinv {n}x{n} (public, XLA PLU)", nb, "f32", nb,
                       dtx, medx, p99x, "inv/s",
                       bytes_per_item=2 * n * n * 4)
            f = jax.jit(B_.batchchol)
            dt = honest_time(f, aj)
            med, p99 = rel_err(np.asarray(f(aj[:4096])),
                               np.linalg.cholesky(a[:4096].astype(np.float64)))
            record(f"batchchol {n}x{n} (public, auto)", nb, "f32", nb, dt,
                   med, p99, "chol/s", bytes_per_item=2 * n * n * 4)
            del a, aj

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
            record("batchinv 3x3 (pallas, cf)", BIG, "f32", BIG, dt, med,
                   p99, "inv/s", bytes_per_item=2 * 9 * 4)
            comp = jax.device_put(jnp.asarray(np.ascontiguousarray(
                np.asarray(full_to_sym(jnp.asarray(a))).T)))
            f = jax.jit(lambda x: chol_cf(x, block=32768))
            dt = honest_time(f, comp)
            lw = np.linalg.cholesky(a[:8192].astype(np.float64))
            lw_comp = np.asarray(full_to_sym(jnp.asarray(
                lw + np.swapaxes(lw, -1, -2) - lw * np.eye(3))))
            med, p99 = rel_err(np.asarray(f(comp[:, :8192])).T, lw_comp)
            record("batchchol 3x3 (pallas, cf)", BIG, "f32", BIG, dt, med,
                   p99, "chol/s", bytes_per_item=2 * 6 * 4)
            del a, cf, comp

    # --- the BASELINE <=16x16 gate (configs[2]) at 16x16 -------------------
    if on("gate16"):
        n16, nb16 = 16, BIG // 2  # 16x16 @ 500k = 512 MB/operand
        a = spd_batch(rng, nb16, n16)
        bvec = rng.standard_normal((nb16, n16)).astype(np.float32)
        aj = jax.device_put(jnp.asarray(a))
        bj = jax.device_put(jnp.asarray(bvec))
        inv_want = np.linalg.inv(a[:2048].astype(np.float64))
        sol_want = np.linalg.solve(a[:2048].astype(np.float64),
                                   bvec[:2048].astype(np.float64)[..., None]
                                   )[..., 0]
        f = jax.jit(B_.batchchol)
        dt = honest_time(f, aj, calls=8)
        med, p99 = rel_err(np.asarray(f(aj[:2048])),
                           np.linalg.cholesky(a[:2048].astype(np.float64)))
        record("batchchol 16x16 (unrolled)", nb16, "f32", nb16, dt, med, p99,
               "chol/s", bytes_per_item=2 * 256 * 4)
        f = jax.jit(B_.batchlogdet)
        dt = honest_time(f, aj, calls=8)
        _, ld = np.linalg.slogdet(a[:2048].astype(np.float64))
        med, p99 = rel_err(np.asarray(f(aj[:2048])), ld)
        record("batchlogdet 16x16 (public, auto)", nb16, "f32", nb16, dt,
               med, p99, "logdet/s", bytes_per_item=(256 + 1) * 4)
        f = jax.jit(B_.batchinv)
        dt = honest_time(f, aj, calls=8)
        med, p99 = rel_err(np.asarray(f(aj[:2048])), inv_want)
        record("batchinv 16x16 (public, auto)", nb16, "f32", nb16, dt, med,
               p99, "inv/s", bytes_per_item=2 * 256 * 4)
        fx = jax.jit(lambda t: B_.batchinv(t, backend="xla"))
        dtx = honest_time(fx, aj, calls=4)
        medx, p99x = rel_err(np.asarray(fx(aj[:2048])), inv_want)
        record("batchinv 16x16 (public, XLA rolled PLU)", nb16, "f32",
               nb16, dtx, medx, p99x, "inv/s", bytes_per_item=2 * 256 * 4)
        # batchmatmul 16x16: auto = XLA dot_general — the rolled
        # stacked-grid kernel (round 4) measured 1.5-4.7x SLOWER
        # standalone at every 8 <= n <= 32 (MXU tile padding is cheaper
        # than k rank-1 VPU passes), so it is explicit-backend only;
        # both rows recorded so the routing decision stays auditable
        bmj = jax.device_put(jnp.asarray(
            rng.standard_normal((nb16, 16, 16)).astype(np.float32)))
        mm_want = (a[:2048].astype(np.float64)
                   @ np.asarray(bmj[:2048], np.float64))
        for bk, tag in (("auto", "auto=xla dot_general"),
                        ("pallas", "forced pallas")):
            f = jax.jit(lambda p, q, b=bk: B_.batchmatmul(p, q, backend=b))
            dt = honest_time(f, aj, bmj, calls=8)
            got = np.asarray(f(aj[:2048], bmj[:2048]))
            med, p99 = rel_err(got, mm_want)
            record(f"batchmatmul 16x16 ({tag})", nb16, "f32", nb16, dt,
                   med, p99, "mm/s", bytes_per_item=3 * 256 * 4,
                   nw_max=normwise(got, mm_want))
        del bmj
        from fastmath_tpu.ops import sugar as SU

        for meth in ("lu", "chol"):
            f = jax.jit(lambda a, b, m=meth: SU.lmdiv(a, b, method=m))
            dt = honest_time(f, aj, bj, calls=8)
            got = np.asarray(f(aj[:2048], bj[:2048]))
            med, p99 = rel_err(got, sol_want)
            record(f"batchlmdiv {meth} 16x16", nb16, "f32", nb16, dt, med,
                   p99, "solves/s", bytes_per_item=(256 + 2 * 16) * 4,
                   nw_max=normwise(got, sol_want))
        del a, aj, bj, bvec

    # --- rolled tier past the BASELINE gate: 17 <= n <= 32 ------------------
    # (hardware-only: the rolled stacked-grid kernels in interpret mode
    # cost minutes at these sizes; CPU parity lives in test_rolled32.py)
    if on("rolled32") and backend == "tpu":
        n24, nb24 = 24, MID
        a = spd_batch(rng, nb24, n24)
        aj = jax.device_put(jnp.asarray(a))
        inv_want = np.linalg.inv(a[:2048].astype(np.float64))
        f = jax.jit(B_.batchinv)
        dt = honest_time(f, aj, calls=8)
        got = np.asarray(f(aj[:2048]))
        med, p99 = rel_err(got, inv_want)
        record("batchinv 24x24 (public, auto->pallas rolled)", nb24, "f32",
               nb24, dt, med, p99, "inv/s", bytes_per_item=2 * 576 * 4,
               nw_max=normwise(got, inv_want))
        fx = jax.jit(lambda t: B_.batchinv(t, backend="xla"))
        dtx = honest_time(fx, aj, calls=2)
        medx, p99x = rel_err(np.asarray(fx(aj[:2048])), inv_want)
        record("batchinv 24x24 (public, xla blocked)", nb24, "f32", nb24,
               dtx, medx, p99x, "inv/s", bytes_per_item=2 * 576 * 4)
        ch_want = np.linalg.cholesky(a[:2048].astype(np.float64))
        f = jax.jit(B_.batchchol)
        dt = honest_time(f, aj, calls=8)
        got = np.asarray(f(aj[:2048]))
        med, p99 = rel_err(got + np.triu(np.ones(n24), 1),
                           ch_want + np.triu(np.ones(n24), 1))
        record("batchchol 24x24 (public, auto->pallas rolled)", nb24, "f32",
               nb24, dt, med, p99, "chol/s", bytes_per_item=2 * 576 * 4,
               nw_max=normwise(got, ch_want))
        fx = jax.jit(lambda t: B_.batchchol(t, backend="xla"))
        dtx = honest_time(fx, aj, calls=2)
        record("batchchol 24x24 (public, xla blocked)", nb24, "f32", nb24,
               dtx, None, None, "chol/s", bytes_per_item=2 * 576 * 4)
        del a, aj
        n32, nb32 = 32, MID // 2
        a = spd_batch(rng, nb32, n32)
        aj = jax.device_put(jnp.asarray(a))
        f = jax.jit(B_.batchlogdet)
        dt = honest_time(f, aj, calls=8)
        _, ld = np.linalg.slogdet(a[:2048].astype(np.float64))
        med, p99 = rel_err(np.asarray(f(aj[:2048])), ld)
        record("batchlogdet 32x32 (public, auto->pallas rolled)", nb32,
               "f32", nb32, dt, med, p99, "logdet/s",
               bytes_per_item=(1024 + 1) * 4)
        f24 = jax.jit(lambda x: Q.eig_sym(x, check_finite=False))
        a24 = spd_batch(rng, MID // 2, n24)
        aj24 = jax.device_put(jnp.asarray(a24))
        dt = honest_time(f24, aj24, calls=4)
        w = np.sort(np.asarray(f24(aj24[:2048])), -1)
        ww = np.sort(np.linalg.eigvalsh(a24[:2048].astype(np.float64)), -1)
        med, p99 = rel_err(w, ww)
        record("eig_sym 24x24 (auto->pallas rolled)", MID // 2, "f32",
               MID // 2, dt, med, p99, "eig/s",
               bytes_per_item=(576 + 24) * 4)
        del a24, aj24
        # every routed boundary gets a measured row (VERDICT r3 weak
        # #6): eig 12 and 32, chol 32, and the JhJ congruence rolled
        # tier — previously CHANGELOG prose only
        f12 = jax.jit(lambda x: Q.eig_sym(x, check_finite=False))
        a12 = spd_batch(rng, MID, 12)
        aj12 = jax.device_put(jnp.asarray(a12))
        dt = honest_time(f12, aj12, calls=8)
        w12 = np.sort(np.asarray(f12(aj12[:2048])), -1)
        ww12 = np.sort(np.linalg.eigvalsh(a12[:2048].astype(np.float64)), -1)
        med, p99 = rel_err(w12, ww12)
        record("eig_sym 12x12 (auto->pallas rolled)", MID, "f32", MID,
               dt, med, p99, "eig/s", bytes_per_item=(144 + 12) * 4)
        del a12, aj12
        f32_ = jax.jit(lambda x: Q.eig_sym(x, check_finite=False))
        a32e = spd_batch(rng, nb32, n32)
        aj32e = jax.device_put(jnp.asarray(a32e))
        dt = honest_time(f32_, aj32e, calls=4)
        w32 = np.sort(np.asarray(f32_(aj32e[:1024])), -1)
        ww32 = np.sort(np.linalg.eigvalsh(a32e[:1024].astype(np.float64)), -1)
        med, p99 = rel_err(w32, ww32)
        record("eig_sym 32x32 (auto->pallas rolled)", nb32, "f32", nb32,
               dt, med, p99, "eig/s", bytes_per_item=(1024 + 32) * 4)
        del a32e, aj32e
        ch_want32 = np.linalg.cholesky(a[:1024].astype(np.float64))
        fch32 = jax.jit(B_.batchchol)
        dt = honest_time(fch32, aj, calls=4)
        gotc = np.asarray(fch32(aj[:1024]))
        med, p99 = rel_err(gotc + np.triu(np.ones(n32), 1),
                           ch_want32 + np.triu(np.ones(n32), 1))
        record("batchchol 32x32 (public, auto->pallas rolled)", nb32,
               "f32", nb32, dt, med, p99, "chol/s",
               bytes_per_item=2 * 1024 * 4)
        del a, aj
        # JhJ congruence (sym_matmul) rolled tier at K=D=16
        kjh = 16
        jmat = rng.standard_normal((MID, kjh, kjh)).astype(np.float32)
        hfull = spd_batch(rng, MID, kjh)
        hcf = np.asarray(full_to_sym(jnp.asarray(hfull)))
        jj = jax.device_put(jnp.asarray(jmat))
        hj = jax.device_put(jnp.asarray(hcf))
        fjh = jax.jit(F.sym_matmul)
        dt = honest_time(fjh, jj, hj, calls=8)
        got_cf = np.asarray(fjh(jj[:2048], hj[:2048]), np.float64)
        want_full = np.einsum(
            "...ji,...jk,...kl->...il", jmat[:2048].astype(np.float64),
            hfull[:2048].astype(np.float64), jmat[:2048].astype(np.float64))
        iu = np.triu_indices(kjh, 1)
        want_cf = np.concatenate(  # f64 compact slots (diag, then triu)
            [want_full[..., np.arange(kjh), np.arange(kjh)],
             want_full[..., iu[0], iu[1]]], -1)
        med, p99 = rel_err(got_cf, want_cf)
        record("sym_matmul JhJ 16x16 (auto->pallas rolled)", MID, "f32",
               MID, dt, med, p99, "jhj/s",
               bytes_per_item=(256 + 136 + 136) * 4)
        del jmat, hfull, hcf, jj, hj

    # --- eig_sym 4x4 huge batch -------------------------------------------
    if on("eig"):
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
            record("eig_sym 4x4 (auto->pallas)", BIG, "f32", BIG, dt, med,
                   p99, "eig/s", bytes_per_item=(16 + 4) * 4)
            # sustained: eigvals feed a rank-augmented next matrix
            dt = chained_time(
                lambda x, a0: a0 + 1e-3 * jnp.eye(4, dtype=x.dtype)
                * Q.eig_sym(x, check_finite=False)[..., :1, None],
                abig, abig, k=8, calls=4)
            record("eig_sym 4x4 sustained (chain k=8)", BIG, "f32", BIG,
                   dt, None, None, "eig/s", bytes_per_item=(16 + 4) * 4)
            del abig
            from fastmath_tpu.kernels import eig_sym_cf

            acf = jax.device_put(
                jnp.asarray(np.ascontiguousarray(
                    np.asarray(full_to_sym(
                        jnp.asarray(spd_batch(rng, BIG, 4)))).T))
            )
            fcf = jax.jit(lambda x: eig_sym_cf(x, block=32768))
            dt = honest_time(fcf, acf, calls=8)
            wcf = np.sort(np.asarray(fcf(acf[:, :8192])).T, -1)
            full8k = np.asarray(F.sym_to_full(
                jnp.asarray(np.asarray(acf[:, :8192]).T)))
            wwcf = np.sort(np.linalg.eigvalsh(full8k.astype(np.float64)), -1)
            med, p99 = rel_err(wcf, wwcf)
            record("eig_sym 4x4 (pallas, cf)", BIG, "f32", BIG, dt, med, p99,
                   "eig/s", bytes_per_item=(10 + 4) * 4)
            del acf
            # analytic closed-form tier (n <= 3, the auto default
            # there): pure elementwise XLA — the measured rows backing
            # the routing flip at n <= 3 (ADVICE r3: the flip was
            # committed on an uncommitted probe number)
            for n_an in (2, 3):
                a_an = spd_batch(rng, BIG, n_an)
                aj_an = jax.device_put(jnp.asarray(a_an))
                f_an = jax.jit(lambda x: Q.eig_sym(x, check_finite=False))
                dt = honest_time(f_an, aj_an, calls=8)
                w_an = np.sort(np.asarray(f_an(aj_an[:8192])), -1)
                ww_an = np.sort(
                    np.linalg.eigvalsh(a_an[:8192].astype(np.float64)), -1)
                med, p99 = rel_err(w_an, ww_an)
                record(f"eig_sym {n_an}x{n_an} (auto->analytic)", BIG,
                       "f32", BIG, dt, med, p99, "eig/s",
                       bytes_per_item=(n_an * n_an + n_an) * 4)
                fp_an = jax.jit(lambda x: Q.eig_sym(
                    x, check_finite=False, backend="pallas"))
                dtp = honest_time(fp_an, aj_an, calls=8)
                medp, p99p = rel_err(
                    np.sort(np.asarray(fp_an(aj_an[:8192])), -1), ww_an)
                record(f"eig_sym {n_an}x{n_an} (forced pallas)", BIG,
                       "f32", BIG, dtp, medp, p99p, "eig/s",
                       bytes_per_item=(n_an * n_an + n_an) * 4)
                del a_an, aj_an
            # 16x16: rolled parallel-order Jacobi tier (9 <= n <= 16;
            # n-1 rounds of n/2 disjoint rotations per sweep applied as
            # full-grid vector ops — kernels/eig_pallas.py). The XLA
            # comparison runs a smaller batch: its per-rotation
            # whole-batch rewrite makes 200k x 16x16 minutes-slow.
            a16 = spd_batch(rng, MID, 16)
            aj16 = jax.device_put(jnp.asarray(a16))
            f16 = jax.jit(lambda x: Q.eig_sym(x, check_finite=False))
            dt = honest_time(f16, aj16, calls=8)
            w16 = np.sort(np.asarray(f16(aj16[:2048])), -1)
            ww16 = np.sort(
                np.linalg.eigvalsh(a16[:2048].astype(np.float64)), -1)
            med, p99 = rel_err(w16, ww16)
            record("eig_sym 16x16 (auto->pallas rolled)", MID, "f32", MID,
                   dt, med, p99, "eig/s", bytes_per_item=(256 + 16) * 4)
            SM16 = 8192
            ax16 = aj16[:SM16]
            fx16 = jax.jit(
                lambda x: Q.eig_sym(x, check_finite=False, backend="xla"))
            dt = honest_time(fx16, ax16, calls=2)
            record("eig_sym 16x16 (jacobi, xla)", SM16, "f32", SM16, dt,
                   med, p99, "eig/s", bytes_per_item=(256 + 16) * 4)
            del a16, aj16, ax16
        del a, aj

    # --- fused power iteration (dominant eigenpair) -------------------------
    if on("maxeig"):
        ITERS = 32
        for n_me in (4, 8):
            # gap-boosted inputs (dominant rank-1): power iteration
            # converges O((l2/l1)^k), so a gapless Wishart batch would
            # report convergence error, not kernel error
            spd_me = spd_batch(rng, BIG, n_me)
            u_me = rng.standard_normal((BIG, n_me)).astype(np.float32)
            u_me /= np.linalg.norm(u_me, axis=-1, keepdims=True)
            spd_me += 8.0 * n_me * np.einsum(
                "bi,bj->bij", u_me, u_me).astype(np.float32)
            del u_me
            cme = np.asarray(full_to_sym(jnp.asarray(spd_me)))
            mj = jax.device_put(jnp.asarray(cme))
            w = np.linalg.eigvalsh(spd_me[:8192].astype(np.float64))
            dom = w[np.arange(8192), np.argmax(np.abs(w), axis=-1)]
            f = jax.jit(lambda m: F.sym_maxeig(m, iters=ITERS))
            dt = honest_time(f, mj)
            got = np.asarray(f(mj[:8192]), np.float64)
            med, p99 = rel_err(got, dom)
            nn_me = n_me * (n_me + 1) // 2
            record(f"sym_maxeig {n_me}x{n_me} (fused, iters={ITERS})", BIG,
                   "f32", BIG, dt, med, p99, "eig/s",
                   bytes_per_item=(nn_me + n_me + 1) * 4)
            # per-step renormalization (renorm_every=1): isolates the
            # serializing rsqrt + cross-row reduction the strided
            # default (8) amortizes
            f1 = jax.jit(lambda m: F.sym_maxeig(m, iters=ITERS,
                                                renorm_every=1))
            dt1 = honest_time(f1, mj)
            med1, p991 = rel_err(np.asarray(f1(mj[:8192]), np.float64),
                                 dom)
            record(f"sym_maxeig {n_me}x{n_me} (renorm_every=1)", BIG,
                   "f32", BIG, dt1, med1, p991, "eig/s",
                   bytes_per_item=(nn_me + n_me + 1) * 4)
            # the same recurrence as a lax.scan of XLA matvecs
            fx = jax.jit(lambda m: F.sym_maxeig(m, iters=ITERS,
                                                backend="xla"))
            dtx = honest_time(fx, mj)
            medx, p99x = rel_err(np.asarray(fx(mj[:8192]), np.float64),
                                 dom)
            record(f"sym_maxeig {n_me}x{n_me} (XLA scan)", BIG, "f32", BIG,
                   dtx, medx, p99x, "eig/s",
                   bytes_per_item=(nn_me + n_me + 1) * 4)
            del mj, spd_me

    # --- dct (matmul path) --------------------------------------------------
    if on("dct"):
        x = rng.standard_normal((BIG, 64)).astype(np.float32)
        xj = jax.device_put(jnp.asarray(x))
        f = jax.jit(lambda t: RT.dct(t, norm="ortho"))
        dt = honest_time(f, xj)
        med, p99 = rel_err(np.asarray(f(xj[:4096])),
                           sfft.dct(x[:4096].astype(np.float64), norm="ortho"))
        record("dct-II n=64 ortho (MXU)", BIG, "f32", BIG, dt, med, p99,
               "rows/s", bytes_per_item=2 * 64 * 4,
               flops_per_item=2 * 64 * 64, mxu_hi=True)
        dt = chained_time(lambda t: RT.dct(t, norm="ortho"), xj, k=32,
                          calls=8)
        record("dct-II n=64 sustained (chain k=32)", BIG, "f32", BIG, dt,
               None, None, "rows/s", bytes_per_item=2 * 64 * 4,
               flops_per_item=2 * 64 * 64, mxu_hi=True)
        del xj, x  # free before staging the big-n operand
        nfft = 65536
        x2 = rng.standard_normal((nfft, 2048)).astype(np.float32)
        x2j = jax.device_put(jnp.asarray(x2))
        f2 = jax.jit(lambda t: RT.dct(t, norm="ortho"))
        dt2 = honest_time(f2, x2j)
        med2, p992 = rel_err(np.asarray(f2(x2j[:1024])),
                             sfft.dct(x2[:1024].astype(np.float64),
                                      norm="ortho"))
        record("dct-II n=2048 ortho (MXU)", nfft, "f32", nfft, dt2, med2,
               p992, "rows/s", bytes_per_item=2 * 2048 * 4,
               flops_per_item=2 * 2048 * 2048, mxu_hi=True)
        # precision="high" (bf16x3) opt-down: ~1.9x at ~1e-5 normwise
        f2h = jax.jit(lambda t: RT.dct(t, norm="ortho", precision="high"))
        dt2h = honest_time(f2h, x2j)
        med2h, p992h = rel_err(np.asarray(f2h(x2j[:1024])),
                               sfft.dct(x2[:1024].astype(np.float64),
                                        norm="ortho"))
        record("dct-II n=2048 precision=high", nfft, "f32", nfft, dt2h,
               med2h, p992h, "rows/s", bytes_per_item=2 * 2048 * 4,
               flops_per_item=2 * 2048 * 2048)
        del x2j, x2

    # --- expm / logm SE(3)-ish 4x4 ------------------------------------------
    if on("lie"):
        X = rng.standard_normal((BIG, 4, 4)).astype(np.float32) * 0.5
        Xj = jax.device_put(jnp.asarray(X))
        f = jax.jit(L.expm)
        dt = honest_time(f, Xj, calls=8)
        want = np.stack([sla.expm(np.asarray(m, np.float64))
                         for m in X[:256]])
        med, p99 = rel_err(np.asarray(f(Xj[:256])), want)
        record("expm 4x4", BIG, "f32", BIG, dt, med, p99, "expm/s",
               bytes_per_item=2 * 16 * 4)
        # sustained: X <- 0.5 * expm(0.5 X) recurrences stay bounded
        dt = chained_time(lambda x: 0.5 * L.expm(x * 0.5), Xj, k=16, calls=8)
        got_sc = np.asarray(jax.jit(
            lambda x: jax.lax.scan(
                lambda c, _: (0.5 * L.expm(c * 0.5), ()), x, None,
                length=16)[0])(Xj[:256]), np.float64)
        want_sc = X[:256].astype(np.float64)
        for _ in range(16):
            want_sc = 0.5 * np.stack([sla.expm(mm * 0.5)
                                      for mm in want_sc])
        medsc, p99sc = rel_err(got_sc, want_sc)
        record("expm 4x4 sustained (chain k=16)", BIG, "f32", BIG, dt,
               medsc, p99sc, "expm/s", bytes_per_item=2 * 16 * 4)
        # logm inputs built on device (expm), accuracy = roundtrip vs X
        Ej = f(Xj)
        f = jax.jit(L.logm)
        dt = honest_time(f, Ej, calls=8)
        med, p99 = rel_err(np.asarray(f(Ej[:8192])),
                           np.asarray(Xj[:8192], np.float64))
        record("logm 4x4 (batched ISS)", BIG, "f32", BIG, dt, med, p99,
               "logm/s", bytes_per_item=2 * 16 * 4)
        # sustained: expm(logm(E)) * c roundtrip chain
        dt = chained_time(lambda e: L.expm(L.logm(e) * 0.999), Ej, k=4,
                          calls=4)
        # chained-oracle accuracy: the k-step roundtrip recurrence is
        # contractive toward 0, so rel-err vs the scipy recurrence on a
        # slice is the honest column
        got_rt = np.asarray(jax.jit(
            lambda e: jax.lax.scan(
                lambda x, _: (L.expm(L.logm(x) * 0.999), ()), e, None,
                length=4)[0])(Ej[:256]), np.float64)
        want_rt = np.asarray(Ej[:256], np.float64)
        for _ in range(4):
            want_rt = np.stack([sla.expm(np.real(sla.logm(mm)) * 0.999)
                                for mm in want_rt])
        medrt, p99rt = rel_err(got_rt, want_rt)
        record("logm+expm 4x4 sustained (chain k=4)", BIG, "f32", BIG,
               2 * dt, medrt, p99rt, "logm/s", bytes_per_item=2 * 16 * 4)
        del Xj, Ej
        # routed-vs-direct at 4x4 (VERDICT r3 item 6): the kernel-direct
        # cf call on channel-first-resident data vs the public routed
        # path (lazy transpose + block-major repack). The two should
        # agree within ~5-10%.
        if backend == "tpu":
            from fastmath_tpu.kernels.expm_pallas import expm_cf as _ecf
            from fastmath_tpu.kernels.logm_pallas import logm_cf as _lcf

            Xcf = jax.device_put(jnp.asarray(np.ascontiguousarray(
                X.reshape(BIG, 16).T)))
            fcf = jax.jit(lambda t: _ecf(t, block=8192))
            dt = honest_time(fcf, Xcf, calls=8)
            medc, p99c = rel_err(np.asarray(fcf(Xcf[:, :256])).T.reshape(
                256, 4, 4), want)
            record("expm 4x4 (pallas, cf direct)", BIG, "f32", BIG, dt,
                   medc, p99c, "expm/s", bytes_per_item=2 * 16 * 4)
            Ecf = jax.jit(lambda t: _ecf(t, block=8192))(Xcf)
            flcf = jax.jit(lambda t: _lcf(t, block=8192))
            dt = honest_time(flcf, Ecf, calls=8)
            medlc, p99lc = rel_err(
                np.asarray(flcf(Ecf[:, :8192])).T.reshape(8192, 4, 4),
                X[:8192].astype(np.float64))
            record("logm 4x4 (pallas, cf direct)", BIG, "f32", BIG, dt,
                   medlc, p99lc, "logm/s", bytes_per_item=2 * 16 * 4)
            del Xcf, Ecf
        # larger-d register tiers: 8x8 (in-register PLU inverse),
        # 16x16 / 24x24 (rolled stacked-grid), 28x28 / 32x32 (the
        # round-5 flat-loop logm tier — these non-normal roundtrip
        # rows ARE the former 4.6-5.3e3 logm/s ISS-cliff rows) —
        # batch scaled down so the working set stays ~BIG*64 B
        for d_l, b_l in ((8, BIG // 4), (16, BIG // 16), (24, BIG // 36),
                         (28, BIG // 49), (32, BIG // 64)):
            Xl = (rng.standard_normal((b_l, d_l, d_l)).astype(np.float32)
                  * (0.5 / np.sqrt(d_l)))
            Xlj = jax.device_put(jnp.asarray(Xl))
            f = jax.jit(L.expm)
            dt = honest_time(f, Xlj, calls=8)
            want = np.stack([sla.expm(np.asarray(m, np.float64))
                             for m in Xl[:256]])
            med, p99 = rel_err(np.asarray(f(Xlj[:256])), want)
            record(f"expm {d_l}x{d_l}", b_l, "f32", b_l, dt, med, p99,
                   "expm/s", bytes_per_item=2 * d_l * d_l * 4)
            Elj = f(Xlj)
            f = jax.jit(L.logm)
            dt = honest_time(f, Elj, calls=8)
            med, p99 = rel_err(np.asarray(f(Elj[:8192])),
                               np.asarray(Xlj[:8192], np.float64))
            record(f"logm {d_l}x{d_l}", b_l, "f32", b_l, dt, med, p99,
                   "logm/s", bytes_per_item=2 * d_l * d_l * 4)
            del Xlj, Elj
        # Symmetric batches at 12 <= d <= 32 route through the rolled
        # Jacobi eig kernel (V.log|w|.V^T — ops/lie.py): measured
        # faster than the register kernel from d=12 up, and past the
        # kernel's d=24 Mosaic-compile cap it replaces the XLA ISS
        # tier. Route + fallback both measured (VERDICT r3 missing #2:
        # the d=25..32 rows used to fall 40x down the ISS cliff; the
        # non-sym logm {8,16,24} rows above are the kernel fallback;
        # non-sym d > 24 keeps plain-XLA ISS — routing its inner
        # inverses through the Pallas PLU measured a 4x loss, see
        # ops/lie.py:_inv_small).
        if backend == "tpu":
            from fastmath_tpu.ops.lie import _iss_log_core as _iss

            for d_s in (16, 28, 32):
                b_s = BIG // 64
                a_s = spd_batch(rng, b_s, d_s) / d_s  # spectrum O(1)
                aj_s = jax.device_put(jnp.asarray(a_s))
                f_s = jax.jit(L.logm)
                dt = honest_time(f_s, aj_s, calls=4)
                want_s = np.stack([
                    np.real(sla.logm(m.astype(np.float64)))
                    for m in a_s[:256]])
                got_s = np.asarray(f_s(aj_s[:256]), np.float64)
                med, p99 = rel_err(got_s, want_s)
                nrm = float(np.max(
                    np.linalg.norm((got_s - want_s).reshape(256, -1), axis=-1)
                    / np.linalg.norm(want_s.reshape(256, -1), axis=-1)))
                record(f"logm {d_s}x{d_s} SPD (auto->sym eig route)", b_s,
                       "f32", b_s, dt, med, p99, "logm/s",
                       bytes_per_item=2 * d_s * d_s * 4, nw_max=nrm)
                if d_s > 24:
                    # d <= 24's asymmetric fallback (register kernel)
                    # already has rows above; past 24 it's the ISS tier
                    f_i = jax.jit(lambda t: _iss(t)[0])
                    dt_i = honest_time(f_i, aj_s, calls=2)
                    med_i, p99_i = rel_err(
                        np.asarray(f_i(aj_s[:256]), np.float64), want_s)
                    record(f"logm {d_s}x{d_s} (XLA ISS tier)", b_s,
                           "f32", b_s, dt_i, med_i, p99_i, "logm/s",
                           bytes_per_item=2 * d_s * d_s * 4)
                del a_s, aj_s
        # meanm: the reference's worst device-boundary case (SURVEY
        # 3.4 — its logm is a per-matrix scipy loop on CPU, so meanm
        # round-trips K matrices every iteration). Here the whole
        # fixed point is one device-resident while_loop, and it vmaps:
        # G independent K-matrix barycenters run lane-parallel.
        # Accuracy column = barycenter residual ||mean_k logm(M \ A_k)||
        # relative to the mean tangent norm (the defining equation),
        # measured on a slice.
        G, K = 4096, 8
        Xg = rng.standard_normal((G, K, 4, 4)).astype(np.float32) * 0.25
        Ag = np.asarray(jax.jit(L.expm)(jnp.asarray(Xg)))
        Agj = jax.device_put(jnp.asarray(Ag))
        # native leading-batch meanm (round 5): the G barycenters run
        # lane-parallel through the kernels in ONE while_loop —
        # vmap(meanm) would batch the pallas_call per problem instead
        # (one padded grid step per barycenter; measured ~65x slower)
        fmean = jax.jit(lambda m: L.meanm(m, max_iter=64))
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("ignore")  # x64-off fallback warning
            dt = honest_time(fmean, Agj, calls=8)
            mg = fmean(Agj[:64])
        # residual oracle on the host (scipy logm): under vmap the
        # device logm's exceptional-branch lax.cond runs both branches
        # and the complex rescue path has no TPU lowering
        mgn = np.asarray(mg, np.float64)
        Asl = Ag[:64].astype(np.float64)
        num, den = [], []
        for gi in range(64):
            Ls = [np.real(sla.logm(np.linalg.solve(mgn[gi], Asl[gi, k])))
                  for k in range(K)]
            num.append(np.linalg.norm(np.mean(Ls, axis=0)))
            den.append(np.mean([np.linalg.norm(l) for l in Ls]))
        resid = np.sort(np.array(num) / np.array(den))
        record(f"meanm K={K} 4x4 (vmapped fixed point)", G, "f32", G, dt,
               float(np.median(resid)), float(resid[int(0.99 * len(resid))]),
               "means/s", bytes_per_item=K * 16 * 4)

    # --- nan reductions ------------------------------------------------------
    if on("reduce"):
        xx = rng.standard_normal((BIG, 64)).astype(np.float32)
        xx[rng.random(xx.shape) < 0.2] = np.nan
        xj = jax.device_put(jnp.asarray(xx))
        f = jax.jit(lambda t: R.nansum(t, dim=-1))
        dt = honest_time(f, xj)
        med, p99 = rel_err(np.asarray(f(xj[:65536])),
                           np.nansum(xx[:65536].astype(np.float64), -1))
        record("nansum dim=-1", BIG, "f32", BIG * 64, dt, med, p99, "elem/s",
               bytes_per_item=4 + 4 / 64)
        del xj, xx

    # --- special / simplex (XLA-fused elementwise families) -----------------
    if on("misc"):
        import scipy.special as ssp
        from fastmath_tpu.ops import special as SP
        from fastmath_tpu.ops import simplex as SX

        # besseli nu=0: two-branch polynomial approximation; inputs
        # straddle the z=15/4 branch split
        z = (rng.random(BIG, dtype=np.float64) * 30.0).astype(np.float32)
        zj = jax.device_put(jnp.asarray(z))
        f = jax.jit(lambda t: SP.besseli(0, t, mode="norm"))
        dt = honest_time(f, zj)
        want = ssp.i0e(z[:65536].astype(np.float64))
        med, p99 = rel_err(np.asarray(f(zj[:65536])), want)
        record("besseli nu=0 (norm)", BIG, "f32", BIG, dt, med, p99,
               "eval/s", bytes_per_item=8)
        # sustained: z <- besseli(0, z, norm) + z stays in [0, 31)
        dt = chained_time(lambda t: SP.besseli(0, t, mode="norm") + t,
                          zj, k=32, calls=8)
        got_bc = np.asarray(jax.jit(
            lambda t: jax.lax.scan(
                lambda c, _: (SP.besseli(0, c, mode="norm") + c, ()), t,
                None, length=32)[0])(zj[:65536]), np.float64)
        want_bc = z[:65536].astype(np.float64)
        for _ in range(32):
            want_bc = ssp.i0e(want_bc) + want_bc
        medbc, p99bc = rel_err(got_bc, want_bc)
        record("besseli nu=0 sustained (chain k=32)", BIG, "f32", BIG, dt,
               medbc, p99bc, "eval/s", bytes_per_item=8)
        # general-nu log-space path (series + uniform asymptotic)
        f = jax.jit(lambda t: SP.besseli(3.7, t, mode="log"))
        dt = honest_time(f, zj)
        want = np.log(ssp.iv(3.7, z[:65536].astype(np.float64)))
        med, p99 = rel_err(np.asarray(f(zj[:65536])), want)
        record("besseli nu=3.7 (log)", BIG, "f32", BIG, dt, med, p99,
               "eval/s", bytes_per_item=8)
        del zj, z
        # implicit-class logsumexp / softmax over K-1 = 8 logits
        xl = rng.standard_normal((BIG, 8)).astype(np.float32)
        xlj = jax.device_put(jnp.asarray(xl))
        f = jax.jit(lambda t: SX.logsumexp(t, dim=-1, implicit=True))
        dt = honest_time(f, xlj)
        x64 = np.concatenate(
            [xl[:65536], np.zeros((65536, 1), np.float32)], -1
        ).astype(np.float64)
        want = ssp.logsumexp(x64, axis=-1)
        med, p99 = rel_err(np.asarray(f(xlj[:65536])), want)
        record("logsumexp implicit K=9", BIG, "f32", BIG, dt, med, p99,
               "rows/s", bytes_per_item=9 * 4)
        f = jax.jit(lambda t: SX.softmax(t, dim=-1, implicit=(True, True)))
        dt = honest_time(f, xlj)
        wsm = ssp.softmax(x64, axis=-1)[..., :8]
        med, p99 = rel_err(np.asarray(f(xlj[:65536])), wsm)
        record("softmax implicit K=9", BIG, "f32", BIG, dt, med, p99,
               "rows/s", bytes_per_item=2 * 8 * 4)
        del xlj, xl

    # --- small-n dense solves (unrolled PLU / cholesky tiers) ---------------
    if on("batched"):
        from fastmath_tpu.ops import sugar as SU
        n8 = 8
        a8 = spd_batch(rng, MID, n8)
        b8 = rng.standard_normal((MID, n8, 2)).astype(np.float32)
        a8j = jax.device_put(jnp.asarray(a8))
        b8j = jax.device_put(jnp.asarray(b8))
        want8 = np.linalg.solve(a8[:2048].astype(np.float64),
                                b8[:2048].astype(np.float64))
        for meth in ("lu", "chol"):
            f = jax.jit(lambda a, b, m=meth: SU.lmdiv(a, b, method=m))
            dt = honest_time(f, a8j, b8j)
            med, p99 = rel_err(np.asarray(f(a8j[:2048], b8j[:2048])), want8)
            record(f"lmdiv {meth} 8x8", MID, "f32", MID, dt, med, p99,
                   "solves/s", bytes_per_item=(64 + 16 + 16) * 4)
        del a8, b8, a8j, b8j

    # --- previously-unmeasured families (round 5, VERDICT r4 next #5) -------
    if on("families"):
        # qr/hessenberg family — the reference's hottest in-repo
        # TorchScript kernels (`_impl/qr.py:432-531`). Accuracy columns
        # are reconstruction residuals (the families' defining
        # contracts): hessenberg reports ||U^H H U - A||, qr_hessenberg
        # ||QR - H||, rq_hessenberg ||Q RQ Q^T - H|| — all relative,
        # f64-accumulated.
        n_h, b_h = 6, MID
        ah = rng.standard_normal((b_h, n_h, n_h)).astype(np.float32)
        ahj = jax.device_put(jnp.asarray(ah))
        f_hes = jax.jit(lambda x: Q.hessenberg(x, check_finite=False))
        dt = honest_time(f_hes, ahj, calls=16)
        h1, u1 = jax.jit(lambda x: Q.hessenberg(
            x, compute_u=True, check_finite=False))(ahj[:2048])
        recon = np.asarray(Q.householder_apply(
            h1, u1, side="both", inverse=True), np.float64)
        med, p99 = rel_err(recon, ah[:2048])
        record(f"hessenberg {n_h}x{n_h}", b_h, "f32", b_h, dt, med, p99,
               "red/s", bytes_per_item=2 * n_h * n_h * 4)

        hj = jax.device_put(jax.jit(
            lambda x: Q.hessenberg(x, check_finite=False))(ahj))
        h64 = np.asarray(hj[:2048], np.float64)
        hfro = np.linalg.norm(h64.reshape(2048, -1), axis=-1)

        def fro_err(got):
            # per-matrix Frobenius-normalized residual (elementwise
            # rel-err blows up on H's exact structural zeros)
            r = (np.abs(got - h64).reshape(2048, -1).max(-1) / hfro)
            return float(np.median(r)), float(np.quantile(r, 0.99))

        f_qr = jax.jit(lambda x: Q.qr_hessenberg(x, check_finite=False))
        dt = honest_time(f_qr, hj, calls=16)
        q2, r2 = f_qr(hj[:2048])
        med, p99 = fro_err(
            np.einsum("...ij,...jk->...ik", np.asarray(q2, np.float64),
                      np.asarray(r2, np.float64)))
        record(f"qr_hessenberg {n_h}x{n_h} (givens)", b_h, "f32", b_h, dt,
               med, p99, "qr/s", bytes_per_item=3 * n_h * n_h * 4)

        f_rq = jax.jit(lambda x: Q.rq_hessenberg(x, check_finite=False))
        dt = honest_time(f_rq, hj, calls=16)
        rq2 = np.asarray(f_rq(hj[:2048]), np.float64)
        q64 = np.asarray(q2, np.float64)
        med, p99 = fro_err(
            np.einsum("...ij,...jk,...lk->...il", q64, rq2, q64))
        record(f"rq_hessenberg {n_h}x{n_h} (QR-iteration kernel)", b_h,
               "f32", b_h, dt, med, p99, "rq/s",
               bytes_per_item=2 * n_h * n_h * 4)
        # sustained: the QR-iteration loop itself (H <- RQ)
        dt = chained_time(lambda x: Q.rq_hessenberg(x, check_finite=False),
                          hj, k=16, calls=8)
        record(f"rq_hessenberg {n_h}x{n_h} sustained (chain k=16)", b_h,
               "f32", b_h, dt, None, None, "rq/s",
               bytes_per_item=2 * n_h * n_h * 4)

        n_t = 8
        at = spd_batch(rng, b_h, n_t)
        atj = jax.device_put(jnp.asarray(at))
        f_tri = jax.jit(lambda x: Q.hessenberg_sym(x, check_finite=False))
        dt = honest_time(f_tri, atj, calls=16)
        t1, ut = jax.jit(lambda x: Q.hessenberg_sym(
            x, compute_u=True, check_finite=False))(atj[:2048])
        recon = np.asarray(Q.householder_apply(
            t1, ut, side="both", inverse=True), np.float64)
        med, p99 = rel_err(recon, at[:2048])
        record(f"hessenberg_sym {n_t}x{n_t} (tridiag)", b_h, "f32", b_h,
               dt, med, p99, "red/s", bytes_per_item=2 * n_t * n_t * 4)
        del ah, ahj, hj, at, atj

        # eig_sym polish cost (round-5 `polish=` surface): n=16 rolled
        # pallas tier with/without the 9-matmul second-order polish
        a16p = spd_batch(rng, MID, 16)
        a16pj = jax.device_put(jnp.asarray(a16p))
        ww16p = np.sort(np.linalg.eigvalsh(
            a16p[:2048].astype(np.float64)), -1)
        for pol in (False, True):
            fp = jax.jit(lambda x, p=pol: Q.eig_sym(
                x, compute_u=True, check_finite=False, polish=p)[0])
            dtp = honest_time(fp, a16pj, calls=8)
            medp, p99p = rel_err(
                np.sort(np.asarray(fp(a16pj[:2048])), -1), ww16p)
            record(f"eig_sym 16x16 vectors polish={pol}", MID, "f32",
                   MID, dtp, medp, p99p, "eig/s",
                   bytes_per_item=(256 + 16 + 256) * 4)
        del a16p, a16pj

        # stochastic family (`stochastic.py:9-142`): accuracy columns
        # are the estimators' sampling errors (their contract), vs
        # exact trace/logdet oracles
        from fastmath_tpu.ops import stochastic as ST

        nst, bst = 64, 512
        ast = rng.standard_normal((bst, nst, nst)).astype(np.float32)
        spdst = (np.einsum("...ij,...kj->...ik", ast, ast) / nst
                 + np.eye(nst, dtype=np.float32))
        sj = jax.device_put(jnp.asarray(spdst))
        # batched tensors are ONE block-diagonal operator to the
        # stochastic family (reference single-operator contract):
        # oracles are the global trace-sum / logdet-sum / max eigenvalue
        key = jax.random.key(0)
        tr_want = np.trace(spdst.astype(np.float64),
                           axis1=-2, axis2=-1).sum()
        for hpp in (False, True):
            f_tr = jax.jit(lambda m, h=hpp: ST.trapprox(
                m, samples=64, hutchpp=h, key=key))
            dt = honest_time(f_tr, sj, calls=8)
            med, p99 = rel_err(np.asarray(f_tr(sj), np.float64), tr_want)
            nm = "hutch++" if hpp else "hutchinson"
            record(f"trapprox {nm} {bst}x{nst} blockdiag s=64", bst,
                   "f32", bst, dt, med, p99, "mat/s",
                   bytes_per_item=nst * nst * 4)
        # vbald runs EAGERLY by design (host-controlled Gauss-Newton
        # loop, like the reference) — wall-clock it as-is, no jit
        vb_out = ST.vbald(sj, key=key)  # warmup (compiles the pieces)
        _ = float(vb_out)
        t0v = time.time()
        for _ in range(4):
            vb_out = ST.vbald(sj, key=key)
        _ = float(vb_out)
        dt = (time.time() - t0v) / 4
        ld_want = np.linalg.slogdet(spdst.astype(np.float64))[1].sum()
        med, p99 = rel_err(np.asarray(vb_out, np.float64), ld_want)
        record(f"vbald {bst}x{nst} blockdiag", bst, "f32", bst, dt, med,
               p99, "mat/s", bytes_per_item=nst * nst * 4)
        f_me = jax.jit(lambda m: ST.maxeig_power(m, max_iter=256,
                                                 key=key))
        dt = honest_time(f_me, sj, calls=8)
        w_want = np.linalg.eigvalsh(spdst.astype(np.float64))[:, -1].max()
        med, p99 = rel_err(np.asarray(f_me(sj), np.float64), w_want)
        record(f"maxeig_power {bst}x{nst} blockdiag", bst, "f32", bst,
               dt, med, p99, "mat/s", bytes_per_item=nst * nst * 4)
        del ast, spdst, sj

        # dct/dst types 1/3/4 + an N-D row (type 2 already measured)
        xd = rng.standard_normal((MID, 64)).astype(np.float32)
        xdj = jax.device_put(jnp.asarray(xd))
        for typ in (1, 3, 4):
            f_d = jax.jit(lambda t, ty=typ: RT.dct(t, type=ty,
                                                   norm="ortho"))
            dt = honest_time(f_d, xdj, calls=16)
            want = sfft.dct(xd[:4096].astype(np.float64), type=typ,
                            norm="ortho")
            med, p99 = rel_err(np.asarray(f_d(xdj[:4096])), want)
            record(f"dct-{'I' * typ if typ < 4 else 'IV'} n=64 ortho",
                   MID, "f32", MID, dt, med, p99, "rows/s",
                   bytes_per_item=2 * 64 * 4,
                   flops_per_item=2 * 64 * 64, mxu_hi=True)
        f_dst = jax.jit(lambda t: RT.dst(t, type=4, norm="ortho"))
        dt = honest_time(f_dst, xdj, calls=16)
        want = sfft.dst(xd[:4096].astype(np.float64), type=4, norm="ortho")
        med, p99 = rel_err(np.asarray(f_dst(xdj[:4096])), want)
        record("dst-IV n=64 ortho", MID, "f32", MID, dt, med, p99,
               "rows/s", bytes_per_item=2 * 64 * 4,
               flops_per_item=2 * 64 * 64, mxu_hi=True)
        del xd, xdj
        x2d = rng.standard_normal((8192, 32, 32)).astype(np.float32)
        x2dj = jax.device_put(jnp.asarray(x2d))
        f_n = jax.jit(lambda t: RT.dctn(t, dim=(-2, -1), norm="ortho"))
        dt = honest_time(f_n, x2dj, calls=16)
        want = sfft.dctn(x2d[:1024].astype(np.float64), axes=(-2, -1),
                         norm="ortho")
        med, p99 = rel_err(np.asarray(f_n(x2dj[:1024])), want)
        record("dctn 32x32 2-D ortho", 8192, "f32", 8192, dt, med, p99,
               "imgs/s", bytes_per_item=2 * 32 * 32 * 4,
               flops_per_item=4 * 32 * 32 * 32, mxu_hi=True)
        del x2d, x2dj

        # expm_derivatives at the SE(3) F=6 gate (BASELINE configs):
        # value+grad+Hessian, one coupled Taylor recursion vs jacfwd
        B6 = np.zeros((6, 4, 4), np.float32)
        B6[0, 0, 3] = B6[1, 1, 3] = B6[2, 2, 3] = 1
        B6[3, 0, 1], B6[3, 1, 0] = 1, -1
        B6[4, 0, 2], B6[4, 2, 0] = 1, -1
        B6[5, 1, 2], B6[5, 2, 1] = 1, -1
        bde = MID
        cde = (rng.standard_normal((bde, 6)) * 0.4).astype(np.float32)
        cdej = jax.device_put(jnp.asarray(cde))
        b6j = jnp.asarray(B6)
        # f64 oracle on a slice via the jacfwd path (norm-safe, exact
        # derivative of scaling-and-squaring); jacfwd runs first so its
        # Hessian is the taylor row's accuracy reference
        for method in ("jacfwd", "taylor"):
            f_ed = jax.jit(lambda c, m=method: L.expm_derivatives(
                c, b6j, grad_X=True, hess_X=True, method=m)[2])
            dt = honest_time(f_ed, cdej, calls=8)
            got = np.asarray(f_ed(cdej[:512]), np.float64)
            if method == "jacfwd":
                want_h = got
                med = p99 = 0.0
            else:
                med, p99 = rel_err(got, want_h)
            record(f"expm_derivatives F=6 val+grad+hess ({method})",
                   bde, "f32", bde, dt,
                   None if method == "jacfwd" else med,
                   None if method == "jacfwd" else p99,
                   "items/s", bytes_per_item=(6 + 16 + 96 + 576) * 4)

    # --- bf16 input rows (BASELINE configs[3] extended to [0]/[2]) ----------
    if on("bf16"):
        spd = spd_batch(rng, BIG, 4)
        compact = np.asarray(full_to_sym(jnp.asarray(spd)))
        vec = rng.standard_normal((BIG, 4)).astype(np.float32)
        want = np.linalg.solve(spd[:8192].astype(np.float64),
                               vec[:8192].astype(np.float64)[..., None]
                               )[..., 0]
        mh = jax.device_put(jnp.asarray(compact).astype(jnp.bfloat16))
        vh = jax.device_put(jnp.asarray(vec).astype(jnp.bfloat16))
        f = jax.jit(F.sym_solve)
        dt = honest_time(f, mh, vh)
        got = np.asarray(f(mh[:8192], vh[:8192]).astype(jnp.float32))
        med, p99 = rel_err(got, want)
        # bf16 inputs: the dominant error is the half rounding of the
        # operands themselves (~8-bit mantissa), not the f32 compute
        record("sym_solve 4x4 (bf16 in, f32 compute)", BIG, "bf16", BIG, dt,
               med, p99, "solves/s", bytes_per_item=(10 + 4 + 4) * 2,
               nw_max=normwise(got, want))
        a3 = spd_batch(rng, BIG, 3)
        a3h = jax.device_put(jnp.asarray(a3).astype(jnp.bfloat16))
        f = jax.jit(B_.batchinv)
        dt = honest_time(f, a3h)
        med, p99 = rel_err(np.asarray(f(a3h[:4096]).astype(jnp.float32)),
                           np.linalg.inv(a3[:4096].astype(np.float64)))
        record("batchinv 3x3 (bf16 in, f32 compute)", BIG, "bf16", BIG, dt,
               med, p99, "inv/s", bytes_per_item=2 * 9 * 2)
        # full BIG batch: at 200k this row was dispatch-bound and swung
        # 3-4x run-to-run (the relay's ~1 ms dispatch vs ~1 ms compute)
        a4h = jax.device_put(jnp.asarray(spd).astype(jnp.bfloat16))
        f = jax.jit(lambda x: Q.eig_sym(x, check_finite=False))
        dt = honest_time(f, a4h, calls=8)
        wh = np.sort(np.asarray(f(a4h[:4096]).astype(jnp.float32)), -1)
        ww4 = np.sort(np.linalg.eigvalsh(spd[:4096].astype(np.float64)), -1)
        med, p99 = rel_err(wh, ww4)
        record("eig_sym 4x4 (bf16 in, f32 compute)", BIG, "bf16", BIG, dt,
               med, p99, "eig/s", bytes_per_item=(16 + 4) * 2)
        del spd, compact, vec, mh, vh, a3, a3h, a4h

    # ---- write tables -------------------------------------------------------
    lines = [
        "# BENCH_MEASURED — per-op throughput + accuracy",
        "",
        f"Backend: `{backend}` ({jax.devices()[0]}).",
        "",
        "**One methodology for every row** (identical to `bench.py`):",
        "32 pipelined jitted calls on device-resident operands, drained by",
        "one scalar fetch (dt = total/32); rel-err vs float64 numpy/scipy",
        "oracles on a slice (random-Wishart inputs; the p99/median spread",
        "reflects conditioning, not kernel error). Solve rows add",
        "`nw_max`, the worst per-solve normwise error ||x-x*||/||x*|| —",
        "the standard solve criterion (elementwise max is dominated by",
        "near-zero solution components). Every kernel family also has a",
        "**sustained** row: k dependent full-batch applications per",
        "dispatch (lax.scan), amortizing the ~1 ms non-overlappable relay",
        "dispatch cost that bounds every single-dispatch row at these",
        "working-set sizes (<= 100 MB) — sustained is the rate iterative",
        "production workloads see. Rows reproduce with",
        "`python bench/suite.py`.",
        "",
        f"Ceilings measured this session: stream "
        f"**{CEILING[0] / 1e9:.1f} GB/s** (jitted elementwise x*a+b over"
        f" 1 GB, read+write); MXU chained 4096^3 GEMM at default "
        f"precision **{MXU_CEILING[0] / 1e12:.1f} TFLOP/s** (bf16-input"
        f" passes) and at precision=\"highest\" (full-f32 passes) "
        f"**{MXU_CEILING_HI[0] / 1e12:.1f} TFLOP/s**. `bytes/item` is"
        " the op's",
        "minimal HBM traffic; `util` is achieved bandwidth over the",
        "stream ceiling. Compute-bound rows (dct basis matmuls) report",
        "TFLOP/s with `MXU` judged against the ceiling of the precision",
        "mode the op actually runs (the f32-contract dct rows use",
        "precision=\"highest\", whose roofline is ~4x below the",
        "bf16-class number — judging them by the default-precision",
        "ceiling misreads speed-of-light as ~25% idle; round-2 VERDICT",
        "weak-item 3, corrected further this round). eig/expm/logm are",
        "VPU-compute-bound register kernels: their byte-util is",
        "expected to sit far below the stream ceiling at",
        "speed-of-light.",
        "",
        "**`bound`** tags each row's binding resource, derived from the",
        "measured ceilings (>= 40% stream ceiling -> DMA; >= 40% MXU",
        "ceiling -> MXU; wall time within ~4x of the ~1 ms relay",
        "dispatch cost -> dispatch; else VPU arithmetic). It explains",
        "the table's apparent anomalies: a **VPU-bound** family's",
        "sustained row ~equals its single-dispatch row (e.g. batchinv",
        "8x8 — dispatch amortization buys nothing when the batch's",
        "arithmetic already dominates the dispatch), while",
        "**dispatch-bound** rows gain 2-7x from chaining.",
        "",
        "| op | batch | dtype | throughput | unit | rel-err med | p99 |"
        " nw max | bytes/item | GB/s | util | TFLOP/s | MXU | bound |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in RESULTS:
        bw = (f"{r['bytes_per_item']:.0f} | {r['gbps']:.1f} | "
              f"{100 * r['util']:.0f}% " if r.get("gbps") else " | | ")
        fl = (f"{r['tflops']:.1f} | {100 * r['mxu_util']:.0f}% "
              if r.get("tflops") else " | ")
        nw = (f"{r['normwise_max']:.1e}" if r.get("normwise_max") is not None
              else "")
        med_s = (f"{r['relerr_median']:.1e}"
                 if r['relerr_median'] is not None else "—")
        p99_s = (f"{r['relerr_p99']:.1e}"
                 if r['relerr_p99'] is not None else "—")
        lines.append(
            f"| {r['op']} | {r['batch']} | {r['dtype']} | "
            f"{r['throughput']:.3e} | {r['unit']} | {med_s} "
            f"| {p99_s} | {nw} | {bw}| {fl}| {r.get('bound', '')} |"
        )
    Path(args.out).write_text("\n".join(lines) + "\n")
    Path(args.out).with_suffix(".json").write_text(json.dumps(RESULTS, indent=1))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
