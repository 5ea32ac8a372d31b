"""Solver models: the CRBE finite-element path and the PINN path."""

from airpollution_tpu.models.crbe import (
    BESCRFEM,
    CRBESolver,
    ElementCR,
    assemble,
    local_matrices,
)

__all__ = ["BESCRFEM", "CRBESolver", "ElementCR", "assemble", "local_matrices"]
