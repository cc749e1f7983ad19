"""North-star benchmark: 1M-batch 4x4 compact-symmetric solve.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}

- value: fp32 solves/sec on the default JAX backend (TPU chip under the
  driver): sustained throughput of CHAIN_K dependent full-batch solves
  per dispatch, pipelined dispatches, drained by one scalar round-trip
  (`block_until_ready` alone under-reports through the axon relay, and
  one solve per dispatch measures the ~1 ms relay dispatch cost, not
  the op). Both sustained forms are measured and reported: the
  `lax.scan` of the public `sym_solve`, and the public fused-iteration
  chain kernel `sym_solve_chain` (same recurrence, loop run inside one
  Pallas kernel with the matrix + cofactors register-resident). The
  headline `value`/`vs_baseline` is pinned to the **scan** form — the
  like-for-like comparison against the reference's single-dispatch
  solve. The fused-chain rate (a register-resident recurrence, ~1 HBM
  byte/solve — a different workload class) is reported separately as
  `value_fused_chain`/`vs_baseline_chain`, each ratio naming its
  workload, so no single number divides a fused recurrence by a
  single-dispatch baseline.
- vs_baseline: ratio vs the reference implementation
  (`nitorch_fastmath._impl.sym.sym_solve`, its TorchScript closed-form
  path) executed with torch on this host's available torch device —
  the only reference hardware we can measure here (BASELINE.md: the
  reference publishes no numbers). Falls back to 0.0 if torch or the
  reference are unavailable.
- accuracy gate: fp32 rel-err vs float64 numpy solve is printed to
  stderr (north-star target: <= 1e-5; conditioned-input median/p99 are
  the meaningful statistics for a random-Wishart batch).
"""
import json
import sys
import time

import numpy as np

B, N = 1_000_000, 4
SCAN_ITERS, REPS = 8, 3
CHAIN_K = 128  # dependent solves per dispatch (see bench_ours)


def _make_inputs(rng):
    a = rng.standard_normal((B, N, N)).astype(np.float32)
    spd = np.einsum("...ij,...kj->...ik", a, a) + N * np.eye(N, dtype=np.float32)
    vec = rng.standard_normal((B, N)).astype(np.float32)
    return spd, vec


def bench_ours(spd, vec):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from fastmath_tpu.layouts import full_to_sym
    from fastmath_tpu.ops.sym import sym_solve

    compact = np.asarray(full_to_sym(jnp.asarray(spd)))
    mat = jax.device_put(jnp.asarray(compact))
    v = jax.device_put(jnp.asarray(vec))

    # Sustained throughput: each jitted call runs CHAIN_K *dependent*
    # full-batch solves (x <- A \ x + v via lax.scan) so the ~1 ms
    # non-overlappable per-dispatch relay cost is amortized — at 1M
    # batch the operands are only 56 MB, and a single solve per
    # dispatch measures dispatch latency, not the op (measured: the
    # same computation at k=1 reads ~7x slower than its sustained
    # rate; k=128 with 24 pipelined dispatches measured 6.55e9 vs
    # 4.78e9 for k=64 x 8). Every iteration is a complete 1M-batch
    # 4x4 compact-symmetric solve with a data-dependent RHS (nothing
    # can be elided).
    @jax.jit
    def run(m, v0):
        def body(x, _):
            return sym_solve(m, x) + v0, ()
        x, _ = jax.lax.scan(body, v0, None, length=CHAIN_K)
        return jnp.sum(x)

    _ = float(run(mat, v))  # compile + warmup
    # pipelined calls; the queue drains at the final scalar fetch,
    # which is what makes the timing honest through the async relay
    t0 = time.time()
    for _ in range(REPS * SCAN_ITERS - 1):
        out = run(mat, v)
    s = float(run(mat, v))
    dt = (time.time() - t0) / (REPS * SCAN_ITERS)
    scan_rate = CHAIN_K * B / dt

    # The same CHAIN_K-step recurrence through the fused-iteration
    # Pallas kernel (`sym_solve_chain`): the matrix block is read from
    # HBM once per grid step and the loop-invariant solve machinery
    # (cofactors + 1/det) is computed once; every iteration applies
    # the complete closed-form solve to the new, data-dependent RHS in
    # registers — the kernel form of the lax.scan above (which
    # re-reads A and re-derives the cofactors from HBM on every
    # iteration). Identical recurrence, identical accuracy oracle.
    from fastmath_tpu.ops.sym import sym_solve_chain

    @jax.jit
    def run_fused(m, v0):
        return jnp.sum(sym_solve_chain(m, v0, CHAIN_K, add=v0))

    _ = float(run_fused(mat, v))
    t0 = time.time()
    for _ in range(REPS * SCAN_ITERS - 1):
        run_fused(mat, v)
    float(run_fused(mat, v))
    dtf = (time.time() - t0) / (REPS * SCAN_ITERS)
    fused_rate = CHAIN_K * B / dtf
    print(
        f"[bench] sustained 4x4 solve: lax.scan(sym_solve) "
        f"{scan_rate:.3e}/s, fused chain kernel {fused_rate:.3e}/s",
        file=sys.stderr,
    )

    # chained-accuracy gate: the fused kernel's k=128 recurrence vs the
    # same recurrence in f64 numpy (error contracts along the chain for
    # these SPD operands; both paths are also gated single-shot below)
    nsl = 2048
    got_chain = np.asarray(
        sym_solve_chain(mat[:nsl], v[:nsl], CHAIN_K, add=v[:nsl]),
        np.float64)
    xo = vec[:nsl].astype(np.float64)
    a64 = spd[:nsl].astype(np.float64)
    for _ in range(CHAIN_K):
        xo = np.linalg.solve(a64, xo[..., None])[..., 0] + vec[:nsl]
    relc = np.abs(got_chain - xo) / (np.abs(xo) + 1e-30)
    nwc = (np.linalg.norm(got_chain - xo, axis=-1)
           / np.linalg.norm(xo, axis=-1))
    print(
        f"[bench] fused-chain accuracy vs f64 128-step oracle: "
        f"elementwise med={np.median(relc):.2e} "
        f"p99={np.quantile(relc, 0.99):.2e}; normwise "
        f"med={np.median(nwc):.2e} max={nwc.max():.2e}",
        file=sys.stderr,
    )
    # headline = the scan form (independent dispatches of the public
    # sym_solve — the workload class the torch-cpu baseline also runs);
    # the fused chain is reported alongside under its own name
    solves_per_sec = scan_rate
    bench_ours.rates = {"scan": scan_rate, "fused_chain": fused_rate}

    # accuracy gate on a slice (single application, fp32 vs f64 oracle).
    # The normwise per-solve error ||x - x*|| / ||x*|| is the standard
    # criterion for linear solves (the elementwise max is dominated by
    # near-zero solution components, where relative error is not the
    # meaningful metric); both are reported.
    single = sym_solve(mat[:65536], v[:65536])
    got = np.asarray(single, dtype=np.float64)
    want = np.linalg.solve(spd[:65536].astype(np.float64),
                           vec[:65536].astype(np.float64)[..., None])[..., 0]
    rel = np.abs(got - want) / (np.abs(want) + 1e-30)
    nw = (np.linalg.norm(got - want, axis=-1)
          / np.linalg.norm(want, axis=-1))
    print(
        f"[bench] backend={jax.default_backend()} elementwise rel-err "
        f"median={np.median(rel):.2e} p99={np.quantile(rel, 0.99):.2e} "
        f"max={rel.max():.2e}",
        file=sys.stderr,
    )
    print(
        f"[bench] normwise rel-err (||x-x*||/||x*|| per solve, the "
        f"solve-accuracy gate): median={np.median(nw):.2e} "
        f"p99={np.quantile(nw, 0.99):.2e} max={nw.max():.2e} "
        f"(north-star target <= 1e-5)",
        file=sys.stderr,
    )
    return solves_per_sec


def bench_reference(spd, vec):
    """Reference TorchScript closed-form sym_solve on this host's torch."""
    try:
        import importlib.util

        import torch

        spec = importlib.util.spec_from_file_location(
            "_ref_sym", "/root/reference/nitorch_fastmath/_impl/sym.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        nb = min(B, 200_000)  # keep the CPU run bounded
        full = np.asarray(spd[:nb])
        rows, cols = np.triu_indices(N, 1)
        compact = np.concatenate(
            [full[..., np.arange(N), np.arange(N)], full[..., rows, cols]],
            axis=-1,
        )
        mat = torch.as_tensor(compact)
        v = torch.as_tensor(vec[:nb])
        ref.sym_solve(mat, v)  # warmup / TS compile
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            ref.sym_solve(mat, v)
        dt = (time.time() - t0) / reps
        return nb / dt
    except Exception as e:  # reference or torch unavailable
        print(f"[bench] reference baseline unavailable: {e}", file=sys.stderr)
        return 0.0


def _device_watchdog(timeout_s: int = 600) -> None:
    """Fail fast (clean JSON error line) if the TPU backend cannot
    initialize: ``jax.devices()`` hangs indefinitely when the axon
    relay is down (observed in round 3 — no relay port listening), and
    a hung bench is worse for the driver than a failed one. Probes in
    a subprocess because a hung PJRT init cannot be interrupted
    in-process."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s, check=True,
        )
    except Exception as e:
        print(
            f"[bench] device init probe failed ({type(e).__name__}): "
            f"backend unreachable (axon relay down?)", file=sys.stderr,
        )
        print(json.dumps({
            "metric": "sym_solve_4x4_1e6batch_fp32",
            "value": 0.0,
            "unit": "solves/sec",
            "vs_baseline": 0.0,
            "error": "device init timed out/failed — TPU tunnel down",
        }))
        sys.exit(1)


def main():
    _device_watchdog()
    rng = np.random.default_rng(0)
    spd, vec = _make_inputs(rng)
    ours = bench_ours(spd, vec)
    ref = bench_reference(spd, vec)
    vs = ours / ref if ref else 0.0
    print(
        f"[bench] ours={ours:.3e} solves/s, reference(torch-"
        f"{'cpu'})={ref:.3e} solves/s",
        file=sys.stderr,
    )
    rates = getattr(bench_ours, "rates", {})
    fused = rates.get("fused_chain", 0.0)
    print(
        json.dumps(
            {
                "metric": "1M-batch 4x4 sym_solve throughput (fp32, per chip)",
                # headline: sustained lax.scan of the public sym_solve —
                # independent full-batch dispatches, the same workload
                # class as the baseline measurement below
                "value": round(ours),
                "unit": "solves/sec",
                # basis: the reference's TorchScript closed-form solve on
                # THIS HOST's torch (single-socket CPU) — the only
                # reference hardware measurable here. The BASELINE.json
                # north star (>= 10x H100-TorchScript) cannot be measured
                # in this environment; do not read this ratio as that one.
                "vs_baseline": round(vs, 2),
                "vs_baseline_workload": "per-dispatch solve rate vs the "
                                        "reference's per-dispatch solve "
                                        "rate (like for like)",
                "baseline_hw": "torch-cpu (this host), reference "
                               "TorchScript sym_solve, 200k-batch",
                # the fused-iteration chain kernel: the same k=128
                # recurrence held register-resident inside one Pallas
                # kernel (~1 HBM byte/solve). A different workload class
                # — its ratio is labeled as such, not the headline.
                "value_fused_chain": round(fused),
                "vs_baseline_chain": round(fused / ref, 2) if ref else 0.0,
                "vs_baseline_chain_workload": "register-resident fused "
                                              "recurrence vs the same "
                                              "single-dispatch baseline "
                                              "(NOT like for like)",
            }
        )
    )


if __name__ == "__main__":
    main()
