"""API parity: every public name the reference exports must exist here.

Reads the reference modules' ``__all__`` lists by AST (no import — the
reference needs torch/jitfields at import time) and checks our flat
namespace. This is the executable form of SURVEY.md §2's component
inventory.
"""
import ast
import pathlib

import pytest

REF = pathlib.Path("/root/reference/nitorch_fastmath")

# names whose semantics are torch-specific and intentionally replaced
# (documented in the module docstrings)
EXCEPTIONS = {
    # reference sym.py re-exports jitfields' in-place variants; we alias
    # them (functional) — they exist, so no exceptions needed here.
}


def ref_all(module: str):
    path = REF / module
    if not path.exists():
        return []
    tree = ast.parse(path.read_text())
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    return [ast.literal_eval(e) for e in node.value.elts]
    return []


MODULES = [
    "sym.py",
    "batched.py",
    "lie.py",
    "qr.py",
    "realtransforms.py",
    "reduce.py",
    "simplex.py",
    "special.py",
    "stochastic.py",
    "sugar.py",
]


@pytest.mark.parametrize("module", MODULES)
def test_reference_exports_covered(module):
    import fastmath_tpu as fm

    names = ref_all(module)
    assert names, f"no __all__ found in reference {module}"
    missing = [
        n for n in names if n not in EXCEPTIONS and not hasattr(fm, n)
    ]
    assert not missing, f"{module}: missing {missing}"


def test_utils_exports_covered():
    import fastmath_tpu.utils as u

    for n in ["ensure_list", "fast_slice_tensor", "slice_tensor", "cumprod",
              "sub2ind", "ind2sub", "eps", "broadcast_backward",
              "custom_fwd", "custom_bwd"]:
        assert hasattr(u, n), n


def test_typing_exports_covered():
    from fastmath_tpu.typing import OneOrSeveral, OneOrTwo  # noqa: F401


def test_northstar_extras_present():
    import fastmath_tpu as fm

    # BASELINE.json configs[3] names erfinv/gammainc beyond the reference
    for n in ["erfinv", "gammainc", "gammaincc"]:
        assert hasattr(fm, n), n
    # the pallas kernel tier and parallel runtime are this build's
    # replacements for jitfields / (absent) distributed machinery
    for n in ["sym_solve_cf", "sym_matvec_cf", "sym_invert_cf"]:
        assert hasattr(fm, n), n
    assert hasattr(fm.parallel, "make_mesh")
    assert hasattr(fm.parallel, "shard_batch")
