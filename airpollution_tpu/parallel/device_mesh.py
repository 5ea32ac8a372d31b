"""Device-mesh construction helpers for multi-chip execution.

The reference has no distributed backend at all (SURVEY.md section 2.5); the
TPU-native communication stack is ``jax.sharding.Mesh`` + ``shard_map`` with
XLA collectives compiled onto ICI. These helpers build the meshes the rest
of ``airpollution_tpu.parallel`` uses:

- ``('dp', 'tp')`` for PINN training (batch-sharded collocation x
  tensor-sharded hidden layers),
- ``('mp',)`` for the row-sharded FEM operator,
- ``('trial',)`` for embarrassingly parallel sweeps (sensitivity/HPO).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict[str, int], devices=None) -> Mesh:
    """Build a named mesh, e.g. ``make_mesh({'dp': 4, 'tp': 2})``."""
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes[n] for n in names)
    n_needed = int(np.prod(shape))
    devices = devices if devices is not None else jax.devices()
    if n_needed > len(devices):
        raise ValueError(
            f"mesh {axis_sizes} needs {n_needed} devices, "
            f"have {len(devices)}"
        )
    dev_array = mesh_utils.create_device_mesh(shape,
                                              devices=devices[:n_needed])
    return Mesh(dev_array, names)


def dp_tp_split(n_devices: int) -> tuple[int, int]:
    """Default (dp, tp) factorization: tp=2 when even, else pure dp."""
    if n_devices % 2 == 0 and n_devices >= 2:
        return n_devices // 2, 2
    return n_devices, 1
