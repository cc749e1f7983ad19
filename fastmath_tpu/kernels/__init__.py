"""Pallas TPU kernels (the native tier; jitfields replacement)."""
from .sym_pallas import (
    sym_solve_cf,
    sym_solve_chain_cf,
    sym_matvec_chain_cf,
    sym_maxeig_cf,
    sym_matvec_cf,
    sym_invert_cf,
    sym_addmatvec_cf,
    sym_submatvec_cf,
    sym_outer_cf,
    sym_det_cf,
    sym_matmul_cf,
    DEFAULT_BLOCK,
)
from .eig_pallas import eig_sym_cf
from .batched_pallas import (chol_cf, det_cf, inv_cf, logdet_cf,
                             matmul_cf, matvec_full_cf, solve_full_cf)
from .expm_pallas import expm_cf
from .logm_pallas import logm_cf

__all__ = [
    "sym_solve_cf",
    "sym_solve_chain_cf",
    "sym_matvec_chain_cf",
    "sym_maxeig_cf",
    "sym_matvec_cf",
    "sym_invert_cf",
    "sym_addmatvec_cf",
    "sym_submatvec_cf",
    "sym_outer_cf",
    "sym_det_cf",
    "sym_matmul_cf",
    "eig_sym_cf",
    "det_cf",
    "inv_cf",
    "logdet_cf",
    "chol_cf",
    "matmul_cf",
    "matvec_full_cf",
    "solve_full_cf",
    "expm_cf",
    "logm_cf",
    "DEFAULT_BLOCK",
]
