"""Shared experiment configuration (parity with the reference drivers).

Schedules and constants mirrored from the reference experiments layer:
mesh sizes and neuron/epoch/patience/lr schedules (pinn_experiments.py:63-68),
loss weights (pinn_experiments.py:60), the mesh->collocation-budget coupling
``n_col = round(n_dofs / 1.4)``, ``n_ic = n_bc = round(0.2 * n_col)``
(pinn.py:577-580, pinn_experiments.py:97-100), and nt = 128.
"""

from __future__ import annotations

import os

import jax

MESH_SIZES = [4, 8, 16, 32, 64, 128]
N_NEURONS = [2, 4, 8, 16, 32, 64]
EPOCHS_LIST = [500, 1000, 2000, 4000, 8000, 16000]
EARLY_STOPPING_PATIENCE_LIST = [500, 500, 500, 1000, 1000, 1000]
LR_LIST = [3e-4, 3e-4, 2e-4, 4e-5, 1e-4, 1e-4]
LAMBDA_WEIGHTS = {"pde": 180.0, "ic": 80.0, "bc": 80.0}
N_STEPS = 128
DOMAIN_SIZE = 20.0
SEED = 1234  # pinn.py:17-18, crbe_experiments.py:14-15


def collocation_budget(n_dofs: int):
    """The reference's mesh-derived PINN batch sizes (pinn.py:577-580)."""
    n_col = round(n_dofs / 1.4)
    n_ic = round(0.2 * n_col)
    n_bc = round(0.2 * n_col)
    return {"pde": n_col, "ic": n_ic, "bc": n_bc}


def str2bool(value):
    """argparse bool that accepts true/false strings. The reference uses
    ``type=bool`` (pinn_experiments.py:24), under which any non-empty string
    is True — this keeps the same flag names but parses sanely."""
    if isinstance(value, bool):
        return value
    return str(value).lower() in ("1", "true", "yes", "y")


def configure_platform():
    """Honor APT_PLATFORM=cpu|tpu. The environment's sitecustomize registers
    the TPU backend in a way that overrides the JAX_PLATFORMS env var, so
    platform selection must go through jax.config before first backend use."""
    plat = os.environ.get("APT_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
        # The package import auto-enabled the persistent compilation
        # cache under the default (non-CPU) platform; on a switch to CPU
        # the guard must be re-evaluated (XLA:CPU AOT loader hazard —
        # utils/compile_cache.py docstring).
        from airpollution_tpu.utils import compile_cache

        compile_cache.sync_platform()


def print_device():
    configure_platform()
    dev = jax.devices()[0]
    print(f"Using device: {dev.platform} ({dev})")
    return dev
