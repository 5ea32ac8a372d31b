"""Multi-chip parallelism: device meshes, DP x TP PINN training,
row-sharded FEM, device-parallel sweeps."""

from airpollution_tpu.parallel.device_mesh import dp_tp_split, make_mesh
from airpollution_tpu.parallel.pinn_parallel import (
    ParallelTrainState,
    build_parallel_trainer,
    forward_tp,
    init_parallel_state,
    tp_param_specs,
)
from airpollution_tpu.parallel.fem_shard import (
    build_sharded_solver,
    pad_operators,
    sharded_matvec,
)
from airpollution_tpu.parallel.fno_parallel import (
    build_fno_dp_trainer,
    train_fno_dp,
)
from airpollution_tpu.parallel.sweep import crbe_diffusion_sweep
from airpollution_tpu.parallel.stencil_shard import build_halo_solver
from airpollution_tpu.parallel.hbm_shard import (
    build_canvas_hbm_halo_solver,
    build_hbm_halo_solver,
    build_multispecies_hbm_halo_solver,
)

__all__ = [
    "dp_tp_split", "make_mesh",
    "ParallelTrainState", "build_parallel_trainer", "forward_tp",
    "init_parallel_state", "tp_param_specs",
    "build_sharded_solver", "pad_operators", "sharded_matvec",
    "build_fno_dp_trainer", "train_fno_dp",
    "crbe_diffusion_sweep",
    "build_halo_solver", "build_hbm_halo_solver",
    "build_canvas_hbm_halo_solver",
    "build_multispecies_hbm_halo_solver",
]
