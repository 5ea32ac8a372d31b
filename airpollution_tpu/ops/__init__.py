"""Compute ops: sparse ELL operators, iterative solvers, sampling, AD."""

from airpollution_tpu.ops.sparse import (
    EllMatrix,
    ell_diagonal,
    ell_from_entries,
    ell_mask_dirichlet_rows,
    ell_matvec,
)
from airpollution_tpu.ops.linalg import (
    gmres,
    SolveResult,
    bicgstab,
    cg,
    jacobi_preconditioner,
)

__all__ = [
    "EllMatrix", "ell_diagonal", "ell_from_entries",
    "ell_mask_dirichlet_rows", "ell_matvec",
    "SolveResult", "bicgstab", "cg", "gmres", "jacobi_preconditioner",
]
