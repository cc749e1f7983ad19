"""The driver entry points must stay importable and runnable."""
import importlib.util
import pathlib

import jax
import numpy as np
import pytest


def _load():
    path = pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_jits():
    mod = _load()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    mod = _load()
    mod.dryrun_multichip(8)
    mod.dryrun_multichip(2)
