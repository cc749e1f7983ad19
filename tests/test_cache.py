"""Persistent compilation cache wiring (core/cache.py).

The contract: ``enable_compilation_cache`` points JAX's persistent
cache at a directory, executables land there after first compile, and
a later process reloads them (~0 s warm compile for rolled-tier Mosaic
kernels — the hardware cold/warm table is in docs/md/performance.md).
These tests validate the wiring on CPU in subprocesses (the cache
config must be set before compiles happen, so an in-process test of
the env knob would be polluted by the suite's earlier jits).
"""
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
import fastmath_tpu as fm

d = fm.enable_compilation_cache({cache!r}, min_compile_time_secs=0.0)
assert d == {cache!r}, d
assert fm.core.compilation_cache_dir() == {cache!r}

from fastmath_tpu.ops.sym import sym_solve
import numpy as np
rng = np.random.default_rng(0)
a = rng.standard_normal((256, 4, 4)).astype(np.float32)
spd = np.einsum("...ij,...kj->...ik", a, a) + 4 * np.eye(4, dtype=np.float32)
from fastmath_tpu.layouts import full_to_sym
m = jnp.asarray(np.asarray(full_to_sym(jnp.asarray(spd))))
v = jnp.asarray(rng.standard_normal((256, 4)).astype(np.float32))
out = jax.jit(sym_solve)(m, v)
print("ok", float(jnp.sum(out)))
"""


def _run_child(cache_dir):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    code = _CHILD.format(repo=_REPO, cache=cache_dir)
    return subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=300,
    )


def test_cache_round_trip(tmp_path):
    cache = str(tmp_path / "jaxcache")
    p1 = _run_child(cache)
    assert p1.returncode == 0, p1.stderr[-2000:]
    entries = [f for _, _, fs in os.walk(cache) for f in fs]
    assert entries, "no cache entries written after first compile"
    # second process: must still succeed (reloading from cache) and not
    # grow the cache for the same executable
    p2 = _run_child(cache)
    assert p2.returncode == 0, p2.stderr[-2000:]
    entries2 = [f for _, _, fs in os.walk(cache) for f in fs]
    assert sorted(entries2) == sorted(entries)


def test_env_knob(tmp_path):
    """FASTMATH_TPU_CACHE_DIR enables the cache at import time."""
    cache = str(tmp_path / "envcache")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["FASTMATH_TPU_CACHE_DIR"] = cache
    code = (
        f"import sys; sys.path.insert(0, {_REPO!r});\n"
        "import fastmath_tpu as fm\n"
        "d = fm.core.compilation_cache_dir()\n"
        f"assert d == {cache!r}, d\n"
        "print('ok')\n"
    )
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, p.stderr[-2000:]
    assert os.path.isdir(cache)
