"""Pallas TPU kernels (the native tier; jitfields replacement)."""
from .sym_pallas import (
    sym_solve_cf,
    sym_matvec_cf,
    sym_invert_cf,
    DEFAULT_BLOCK,
)

__all__ = ["sym_solve_cf", "sym_matvec_cf", "sym_invert_cf", "DEFAULT_BLOCK"]
