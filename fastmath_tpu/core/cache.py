"""Persistent compilation cache for the native kernel tier.

Mosaic compiles of the rolled stacked-grid kernels are expensive —
measured cold times on TPU v5e: eig n=32 ~51 s, PLU n=32 ~63 s, expm
d=32 ~111 s, logm d=24 ~125 s (CHANGELOG round 3) — and every fresh
process pays them again. The reference gets on-disk kernel caching for
free from its JIT stack (jitfields compiles C++/CUDA once per machine,
``/root/reference/docs/md/install.md:8-18``); this module is the JAX
equivalent: an opt-in wiring of JAX's persistent compilation cache so a
previously compiled (op, n, block) executable round-trips from disk in
~0 s in any later process.

Two ways to enable:

* programmatic: ``fastmath_tpu.enable_compilation_cache("/path")``
  (call before the first jit/kernel dispatch; path defaults to
  ``~/.cache/fastmath_tpu/jax``);
* environment: set ``FASTMATH_TPU_CACHE_DIR=/path`` before importing
  ``fastmath_tpu`` — the package enables the cache at import time.

Scope note: this is JAX's own cache (``jax_compilation_cache_dir``),
keyed on the HLO/Mosaic payload + compiler flags + backend identity; it
therefore also caches every XLA program, not just Pallas kernels. The
threshold ``min_compile_time_secs`` (default 1.0 — JAX's own default)
keeps trivial executables out of the cache; the rolled-tier kernels are
minutes-cold, so they always qualify.
"""
from __future__ import annotations

import os
from typing import Optional

__all__ = ["enable_compilation_cache", "compilation_cache_dir"]

_DEFAULT_SUBDIR = os.path.join("~", ".cache", "fastmath_tpu", "jax")
_ENV_KNOB = "FASTMATH_TPU_CACHE_DIR"


def compilation_cache_dir() -> Optional[str]:
    """The currently configured cache directory (None = cache off)."""
    import jax

    return jax.config.jax_compilation_cache_dir


def enable_compilation_cache(
    cache_dir: Optional[str] = None,
    *,
    min_compile_time_secs: float = 1.0,
) -> str:
    """Enable JAX's persistent compilation cache for this process.

    ``cache_dir`` defaults to ``$FASTMATH_TPU_CACHE_DIR`` or
    ``~/.cache/fastmath_tpu/jax``. Executables whose compile took at
    least ``min_compile_time_secs`` are written to disk and reloaded by
    any later process with the same backend + jaxlib; a second process
    pays ~0 s for a previously compiled (op, n, block) kernel
    (measured round-trip table: ``docs/md/performance.md``).

    Returns the directory in use. Idempotent; safe to call first thing
    after import (must run before the executables you want cached are
    compiled — already-compiled executables stay in-memory only).
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(_ENV_KNOB) or _DEFAULT_SUBDIR
    cache_dir = os.path.expanduser(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_time_secs),
    )
    # cache everything that clears the time threshold regardless of
    # payload size (rolled-tier executables are large but that's the
    # point); 0 disables the size gate
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def _maybe_enable_from_env() -> None:
    """Import-time hook: honor ``FASTMATH_TPU_CACHE_DIR`` if set."""
    if os.environ.get(_ENV_KNOB):
        enable_compilation_cache()
