"""IO: checkpoint/resume for training state and solution fields."""

from airpollution_tpu.io.checkpoint import (
    read_meta,
    train_with_checkpoints,
    load_field,
    load_pinn,
    load_pytree,
    save_field,
    save_pinn,
    save_pytree,
)

__all__ = [
    "load_field", "load_pinn", "load_pytree",
    "save_field", "save_pinn", "save_pytree", "read_meta", "train_with_checkpoints",
]
