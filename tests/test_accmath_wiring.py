"""Source-scan gate: no raw ``jnp.log`` on log-output paths.

Round-4 finding (CLAUDE.md): XLA's TPU f32 ``log`` is ~4000 ulp
worst-case, so any op whose *output* is a log must go through
``core/accmath.log`` (~1-2 ulp Cody-Waite construction). This test
pins the rule mechanically — same pattern as the tier-cap sync tests —
so a new ``jnp.log`` on an output path fails CI instead of silently
shipping a 1e-4-class f32 tail (VERDICT r4 weak-item 2 / next-round 1).

Allowed exceptions, each counted exactly:

* ``core/accmath.py`` itself (f64 passthrough + IEEE edge deferral);
* ``ops/lie.py``: one complex ``jnp.log(lam)`` on the normal-matrix
  exceptional route (accmath.log is real-only; that route is
  f64-complex in practice);
* Pallas kernel bodies (``kernels/*.py``): Mosaic in-kernel code where
  the |logdet| outputs are large enough that relative error gates pass
  (round-4 finding) — gated by their own rel-err tests instead.
"""
from __future__ import annotations

import pathlib
import re

import fastmath_tpu

PKG = pathlib.Path(fastmath_tpu.__file__).parent

# module (relative to package) -> max allowed raw `jnp.log(` calls
_ALLOWED = {
    "ops/special.py": 0,
    "ops/simplex.py": 0,
    "ops/stochastic.py": 0,
    "ops/batched.py": 0,
    "ops/lie.py": 1,  # complex eig-route log (accmath is real-only)
    "ops/sym.py": 0,
    "ops/reduce.py": 0,
    "ops/qr.py": 0,
    "ops/sugar.py": 0,
    "ops/realtransforms.py": 0,
}

_RAW_LOG = re.compile(r"\bjnp\.log\(")


def test_no_raw_jnp_log_on_output_paths():
    offenders = {}
    for rel, allowed in _ALLOWED.items():
        src = (PKG / rel).read_text()
        hits = len(_RAW_LOG.findall(src))
        if hits > allowed:
            offenders[rel] = (hits, allowed)
    assert not offenders, (
        f"raw jnp.log( on log-output modules (found, allowed): {offenders}; "
        "use fastmath_tpu.core.accmath.log (round-4 accuracy rule)"
    )


def test_accmath_log_is_wired_where_required():
    # the modules with log outputs must actually import accmath
    for rel in ("ops/special.py", "ops/simplex.py", "ops/stochastic.py",
                "ops/lie.py", "ops/batched.py"):
        src = (PKG / rel).read_text()
        assert "core.accmath import log" in src or "accmath" in src, rel
