"""airpollution_tpu: a TPU-native 2D advection-diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
AirPollution study (clemsadand/AirPollution): a Crouzeix-Raviart
nonconforming-FEM solver with implicit time stepping (CRBE), a
physics-informed neural network solver (PINN), experiment drivers,
reporting, physics diagnostics, and multi-chip scaling via jax.sharding.

Public API mirrors the reference surface (crbe.py / pinn.py / utils/common.py
re-exports) while every compute path is designed TPU-first: vectorized
assembly with segment-sum scatter, ELL SpMV + iterative solves under
``lax.scan``, fully on-device PINN training, and shard_map parallel sweeps.
"""

from airpollution_tpu.utils.compile_cache import enable_compilation_cache

# Persistent XLA compilation cache, on by default (APT_COMPILATION_CACHE=0
# to opt out): first-touch compiles of the fused programs cost minutes on
# the remote-compile backend, and the on-disk cache makes every later
# process load them in seconds (utils/compile_cache.py).
enable_compilation_cache()

from airpollution_tpu.problems import (
    AdDifProblem,
    AnisotropicPlumeProblem,
    Domain,
    GaussianSourceProblem,
    MultiSpeciesProblem,
    Problem,
    RotatingPlumeProblem,
    ShiftedPlumeProblem,
    SquarePulseProblem,
    TurningWindProblem,
)
from airpollution_tpu.mesh import (Mesh, MeshData, create_mesh,
                                   create_unstructured_mesh, read_msh,
                                   write_msh)

__version__ = "0.1.0"

__all__ = [
    "AdDifProblem",
    "AnisotropicPlumeProblem",
    "Domain",
    "GaussianSourceProblem",
    "MultiSpeciesProblem",
    "Problem",
    "RotatingPlumeProblem",
    "ShiftedPlumeProblem",
    "SquarePulseProblem",
    "TurningWindProblem",
    "Mesh",
    "MeshData",
    "create_mesh",
    "create_unstructured_mesh",
    "read_msh",
    "write_msh",
]
