"""Solver models: the CRBE finite-element path, the PINN path, and the
FNO operator-surrogate path (models/fno, imported lazily — it pulls
optax only when used)."""

from airpollution_tpu.models.crbe import (
    BESCRFEM,
    CRBESolver,
    ElementCR,
    assemble,
    local_matrices,
    run_time_loop,
)
from airpollution_tpu.models.multispecies import (
    MultiSpeciesSolver,
    run_multispecies_loop,
)
from airpollution_tpu.models.pinn import (
    PINN,
    EarlyStopping,
    count_parameters,
    init_mlp_params,
    mlp_apply,
)

__all__ = [
    "BESCRFEM", "CRBESolver", "ElementCR", "assemble", "local_matrices",
    "run_time_loop",
    "MultiSpeciesSolver", "run_multispecies_loop",
    "PINN", "EarlyStopping", "count_parameters", "init_mlp_params",
    "mlp_apply",
]
