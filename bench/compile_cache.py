"""Cold/warm compile-time table for the rolled-tier Mosaic kernels.

The rolled stacked-grid kernels compile for minutes per (op, n) shape
(CLAUDE.md round 3) and a fresh process pays that again — unless the
persistent compilation cache is enabled
(``fastmath_tpu.enable_compilation_cache`` / ``FASTMATH_TPU_CACHE_DIR``,
``fastmath_tpu/core/cache.py``). This script measures, for the worst
shapes, the **jit phases separately** in fresh subprocesses:

* ``trace``  — ``jax.jit(fn).lower(*args)`` (python tracing + HLO);
* ``compile`` — ``lowered.compile()`` — the phase the persistent cache
  serves: COLD is the true Mosaic compile, WARM the disk round-trip;
* ``first_run`` — first dispatch incl. device program load. On the
  axon-tunnel TPU this is dominated by relay program-load of the large
  Mosaic binary (tens of seconds, high variance) and is NOT helped by
  the cache — reported so the table cannot be read as a cache miss.

The reference's analog is jitfields' natively cached JIT (its kernels
compile once per machine, ``/root/reference/docs/md/install.md:8-18``).

Usage: python bench/compile_cache.py [--out COMPILE_CACHE.md]
Each measurement runs in a subprocess so process-lifetime in-memory
caches cannot contaminate it.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

# (label, python body). The body must define `fn` (jittable) and `args`
# (tuple) for the op's worst rolled shape on a tiny batch.
CASES = [
    ("eig_sym n=32 (rolled Jacobi, values+vectors)", """
from fastmath_tpu.ops.qr import eig_sym
a = jnp.eye(32, dtype=jnp.float32) + 0.01 * jnp.ones((32, 32), jnp.float32)
args = (jnp.broadcast_to(a, (1024, 32, 32)),)
fn = lambda x: eig_sym(x, compute_u=True, check_finite=False,
                       backend="pallas")
"""),
    ("expm d=32 (rolled stacked-grid)", """
from fastmath_tpu.ops.lie import expm
x = 0.1 * jnp.eye(32, dtype=jnp.float32)
args = (jnp.broadcast_to(x, (1024, 32, 32)),)
fn = lambda t: expm(t, backend="pallas")
"""),
    ("logm d=24 (rolled stacked-grid, nested while)", """
from fastmath_tpu.kernels.logm_pallas import logm_cf
cf = jnp.zeros((576, 1024), jnp.float32)
eye = jnp.asarray(np.eye(24, dtype=np.float32).reshape(576, 1))
args = (cf + 1.5 * eye,)
fn = logm_cf
"""),
    ("logm d=32 (flat-loop tier)", """
from fastmath_tpu.kernels.logm_pallas import logm_cf
cf = jnp.zeros((1024, 1024), jnp.float32)
eye = jnp.asarray(np.eye(32, dtype=np.float32).reshape(1024, 1))
args = (cf + 1.5 * eye,)
fn = logm_cf
"""),
    ("batchinv n=32 (rolled PLU)", """
from fastmath_tpu.ops.batched import batchinv
a = jnp.broadcast_to(2.0 * jnp.eye(32, dtype=jnp.float32), (1024, 32, 32))
args = (a,)
fn = lambda t: batchinv(t, backend="pallas")
"""),
]

_TEMPLATE = """
import sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import fastmath_tpu as fm
fm.enable_compilation_cache({cache!r}, min_compile_time_secs=0.5)
import jax, jax.numpy as jnp
{body}
t0 = time.time(); lowered = jax.jit(fn).lower(*args)
t_trace = time.time() - t0
t0 = time.time(); compiled = lowered.compile()
t_compile = time.time() - t0
t0 = time.time(); out = compiled(*args)
drain = float(sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out)))
t_run = time.time() - t0
print("PHASES", t_trace, t_compile, t_run, drain)
"""


def run_case(body, cache_dir, timeout=3600):
    code = _TEMPLATE.format(repo=str(_REPO), cache=cache_dir, body=body)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    for line in proc.stdout.splitlines():
        if line.startswith("PHASES"):
            parts = line.split()
            return float(parts[1]), float(parts[2]), float(parts[3])
    raise RuntimeError(f"no PHASES line in:\n{proc.stdout[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="COMPILE_CACHE.md")
    args = ap.parse_args()
    rows = []
    with tempfile.TemporaryDirectory() as cache_dir:
        for label, body in CASES:
            cold = run_case(body, cache_dir)
            warm = run_case(body, cache_dir)
            rows.append((label, cold, warm))
            print(f"{label:50s} compile cold {cold[1]:6.1f} s -> warm "
                  f"{warm[1]:5.1f} s   (trace {warm[0]:.1f} s, first-run "
                  f"load {warm[2]:.1f} s)", file=sys.stderr, flush=True)
        n_entries = sum(len(fs) for _, _, fs in os.walk(cache_dir))
    import jax

    lines = [
        "# Rolled-tier compile times: cold vs persistent-cache warm",
        "",
        f"Backend: `{jax.default_backend()}`. Method: each row runs the",
        "op's worst rolled shape in a FRESH python process twice against",
        "the same `FASTMATH_TPU_CACHE_DIR` — cold (empty cache: the true",
        "Mosaic compile) then warm (the executable round-trips from",
        "disk). Phases measured separately: **compile** is",
        "`jax.jit(fn).lower(args).compile()` — the phase the persistent",
        "cache serves; *trace* (python tracing + lowering) and",
        "*first-run* (first dispatch incl. the axon relay's program",
        "load of the large Mosaic binary — tens of seconds, high",
        "variance, NOT a cache miss) are paid by every fresh process",
        "regardless. Enable with `fastmath_tpu.enable_compilation_cache()`",
        "or the `FASTMATH_TPU_CACHE_DIR` env knob",
        f"(`fastmath_tpu/core/cache.py`). Cache entries: {n_entries}.",
        "",
        "| kernel (worst rolled shapes) | compile cold | compile warm |"
        " trace | first-run load (warm) |",
        "|---|---|---|---|---|",
    ]
    for label, cold, warm in rows:
        lines.append(
            f"| {label} | {cold[1]:.1f} s | **{warm[1]:.1f} s** |"
            f" {warm[0]:.1f} s | {warm[2]:.1f} s |")
    Path(args.out).write_text("\n".join(lines) + "\n")
    Path(args.out).with_suffix(".json").write_text(json.dumps(
        [dict(case=label,
              cold=dict(trace_s=c[0], compile_s=c[1], first_run_s=c[2]),
              warm=dict(trace_s=w[0], compile_s=w[1], first_run_s=w[2]))
         for label, c, w in rows], indent=1))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
