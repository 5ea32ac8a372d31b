"""Checkpoint / resume for PINN training and CRBE fields.

The reference's only state capture is the in-memory EarlyStopping weight
snapshot (pinn.py:76) — nothing reaches disk and nothing can resume
(SURVEY.md section 5.4). This module adds durable checkpointing:

- orbax-backed when available (the standard JAX checkpointing stack),
  falling back to plain ``.npz`` archives of the flattened pytree;
- ``save_pinn`` / ``load_pinn`` capture parameters plus the full training
  carry (Adam moments, plateau/early-stop state) so training resumes
  exactly where it left off (see ``PINN.train(warm_start=True)``);
- ``save_field`` / ``load_field`` store CRBE solution snapshots.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def _atomic_write_text(path: str, text: str) -> None:
    """Write-then-rename so a crash mid-write never truncates ``path``
    (json.dump over an existing file truncates FIRST — a kill there
    corrupts the checkpoint the recovery loop depends on)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def save_pytree(path: str, tree) -> None:
    """Save any pytree of arrays as a .npz plus a structure descriptor.

    Both files are written atomically (tmp + rename); a crash between
    the two renames leaves a mismatched pair, which ``load_pytree``'s
    structure guard rejects with ValueError instead of loading garbage.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, treedef = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    tmp = path + ".tmp.npz"  # np.savez appends .npz to bare names
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    _atomic_write_text(path + ".tree", str(treedef))


def load_pytree(path: str, like):
    """Load arrays saved by :func:`save_pytree` into the structure of
    ``like``. The saved ``.tree`` descriptor must match ``like``'s
    structure (guards against loading into a mismatched model)."""
    data = np.load(path)
    flat_like, treedef = _flatten_with_paths(like)
    tree_path = path + ".tree"
    if os.path.exists(tree_path):
        with open(tree_path) as f:
            saved = f.read()
        if saved != str(treedef):
            raise ValueError(
                f"checkpoint structure mismatch: {path} was saved with a "
                "different pytree structure than the target"
            )
    n_saved = len([k for k in data.files if k.startswith("leaf_")])
    if n_saved != len(flat_like):
        # ValueError (not a raw NpzFile KeyError) so callers that migrate
        # legacy layouts — _load_carry_with_migration — can catch it even
        # when the .tree descriptor file is missing.
        raise ValueError(
            f"checkpoint leaf count mismatch: {path} holds {n_saved} "
            f"leaves but the target expects {len(flat_like)}"
        )
    leaves = [data[f"leaf_{i}"] for i in range(len(flat_like))]
    for i, (saved, target) in enumerate(zip(leaves, flat_like)):
        if tuple(saved.shape) != tuple(np.shape(target)):
            raise ValueError(
                f"checkpoint leaf {i} has shape {tuple(saved.shape)} but the "
                f"target expects {tuple(np.shape(target))} — the checkpoint "
                "was saved from a different model size"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_pinn(ckpt_dir: str, model, step: int | None = None, *,
              epoch: int | None = None) -> str:
    """Checkpoint a PINN: params + training carry + metadata.

    ``step`` selects the file tag (None -> the rolling "latest" set);
    ``epoch`` records the resume point in the metadata independently of
    the tag, so the recovery loop can write it in the SAME atomic meta
    write instead of patching the file afterwards.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    tag = f"step_{step}" if step is not None else "latest"
    path = os.path.join(ckpt_dir, f"pinn_{tag}.npz")
    save_pytree(path, model.params)
    if model._carry_state is not None:
        save_pytree(os.path.join(ckpt_dir, f"carry_{tag}.npz"),
                    model._carry_state)
    meta = {
        "layers": model.layers,
        "activation": model.activation,
        "step": epoch if epoch is not None else step,
        "history_len": len(model.history["total_loss"]),
    }
    _atomic_write_text(os.path.join(ckpt_dir, f"meta_{tag}.json"),
                       json.dumps(meta))
    return path


def _load_carry_with_migration(carry_path: str, like):
    """Load a training carry, migrating legacy checkpoints.

    TrainState gained three trailing scalar fields (lam_ic, lam_bc, step —
    the adaptive-weight carry). A carry saved before that has exactly
    three fewer leaves, all missing at the END of the flatten order
    (NamedTuple field order), so the prefix loads verbatim and the new
    fields keep the freshly-initialized values from ``like``.
    """
    try:
        return load_pytree(carry_path, like)
    except ValueError:
        data = np.load(carry_path)
        flat_like, treedef = jax.tree_util.tree_flatten(like)
        n_saved = len([k for k in data.files if k.startswith("leaf_")])
        if n_saved != len(flat_like) - 3:
            raise
        leaves = [data[f"leaf_{i}"] for i in range(n_saved)]
        for i, (saved, target) in enumerate(zip(leaves, flat_like)):
            if tuple(saved.shape) != tuple(np.shape(target)):
                raise ValueError(
                    f"checkpoint leaf {i} has shape {tuple(saved.shape)} "
                    f"but the target expects {tuple(np.shape(target))}"
                )
        leaves = leaves + list(flat_like[-3:])
        print(f"Migrated legacy carry checkpoint {carry_path} "
              "(pre-adaptive-weights format)")
        return jax.tree_util.tree_unflatten(treedef, leaves)


def load_pinn(ckpt_dir: str, model, step: int | None = None):
    """Restore params (and the training carry if present) into ``model``."""
    tag = f"step_{step}" if step is not None else "latest"
    path = os.path.join(ckpt_dir, f"pinn_{tag}.npz")
    model.params = load_pytree(path, model.params)
    carry_path = os.path.join(ckpt_dir, f"carry_{tag}.npz")
    if model._carry_state is not None and os.path.exists(carry_path):
        model._carry_state = _load_carry_with_migration(
            carry_path, model._carry_state
        )
    return model


def save_field(path: str, solutions, times=None) -> None:
    """Store a CRBE space-time field (and optionally its time grid)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"solutions": np.asarray(solutions)}
    if times is not None:
        payload["times"] = np.asarray(times)
    np.savez(path, **payload)


def load_field(path: str):
    data = np.load(path)
    times = data["times"] if "times" in data else None
    return data["solutions"], times


def read_meta(ckpt_dir: str, step: int | None = None) -> dict | None:
    tag = f"step_{step}" if step is not None else "latest"
    path = os.path.join(ckpt_dir, f"meta_{tag}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def train_with_checkpoints(model, batch_sizes, epochs, lr, lambda_weights,
                           ckpt_dir, checkpoint_every=500, resume=True,
                           **train_kwargs):
    """Train a PINN in checkpointed chunks with crash recovery.

    The failure-recovery subsystem the reference lacks (SURVEY.md section
    5.3-5.4): training runs in ``checkpoint_every``-epoch chunks under
    ``warm_start`` continuation, persisting params + optimizer carry after
    each chunk; on restart with ``resume=True`` the latest checkpoint is
    loaded and training continues from the recorded epoch.
    """
    start_epoch = 0
    meta = read_meta(ckpt_dir) if resume else None
    if meta is not None:
        # Materialize the carry structure, then restore into it.
        model.train(batch_sizes, 0, lr, lambda_weights, **train_kwargs)
        load_pinn(ckpt_dir, model)
        start_epoch = int(meta.get("step") or 0)
        print(f"Resumed from {ckpt_dir} at epoch {start_epoch}")

    done = start_epoch
    while done < epochs:
        chunk = min(checkpoint_every, epochs - done)
        model.train(
            batch_sizes, chunk, lr, lambda_weights,
            warm_start=(done > 0), **train_kwargs,
        )
        done += chunk
        # One atomic save records the resume point with the weights —
        # no read-modify-write window for a crash to land in.
        save_pinn(ckpt_dir, model, step=None, epoch=done)
    return model.history


def have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:
        return False


def save_pytree_orbax(ckpt_dir: str, tree) -> None:
    """Orbax-backed save (preferred when available)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(ckpt_dir), tree, force=True)


def load_pytree_orbax(ckpt_dir: str, like):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(ckpt_dir), like)
