"""Tests for checkpoint/resume (io.checkpoint)."""

import numpy as np
import jax.numpy as jnp

from airpollution_tpu.io import (
    load_field,
    load_pinn,
    load_pytree,
    save_field,
    save_pinn,
    save_pytree,
)
from airpollution_tpu.models.pinn import PINN
from airpollution_tpu.problems import Domain, Problem


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": [jnp.ones((2, 3)), jnp.zeros(())]}
    path = str(tmp_path / "tree.npz")
    save_pytree(path, tree)
    restored = load_pytree(path, tree)
    np.testing.assert_array_equal(restored["a"], np.arange(5.0))
    np.testing.assert_array_equal(restored["b"][0], np.ones((2, 3)))


def test_pinn_checkpoint_resume(tmp_path):
    """Params and training carry survive a save/load cycle; resumed
    training continues from the checkpointed optimizer state."""
    args = ({"pde": 64, "ic": 16, "bc": 16}, 30, 1e-3,
            {"pde": 1.0, "ic": 1.0, "bc": 1.0})
    model = PINN([3, 8, 1], Problem(), Domain(), activation="tanh", seed=0)
    model.train(*args)
    ckpt = str(tmp_path / "ckpt")
    save_pinn(ckpt, model, step=30)

    model2 = PINN([3, 8, 1], Problem(), Domain(), activation="tanh", seed=0)
    model2.train(*args)  # populate carry structure, different end state
    load_pinn(ckpt, model2, step=30)
    for p1, p2 in zip(model.params, model2.params):
        np.testing.assert_array_equal(p1["W"], p2["W"])
    # Resume: warm start continues without error from restored carry.
    model2.train(*args, warm_start=True)
    assert np.isfinite(model2.history["total_loss"][-1])


def test_field_roundtrip(tmp_path):
    U = np.random.default_rng(0).normal(size=(4, 10))
    t = np.linspace(0, 1, 4)
    path = str(tmp_path / "field.npz")
    save_field(path, U, t)
    U2, t2 = load_field(path)
    np.testing.assert_array_equal(U2, U)
    np.testing.assert_array_equal(t2, t)


def test_reference_module_reexports():
    """API-parity: crbe.Problem / pinn.Domain style access works
    (crbe.py:12, pinn.py:14 re-export contract)."""
    from airpollution_tpu.models import crbe as crbe_mod
    from airpollution_tpu.models import pinn as pinn_mod

    assert crbe_mod.Problem is pinn_mod.Problem
    assert crbe_mod.Domain().T == 10
    assert callable(pinn_mod.lhs_sampling)
    assert callable(pinn_mod.sample_boundary_points)


def test_train_with_checkpoints_resume(tmp_path):
    """Chunked checkpointed training resumes from the recorded epoch after
    a simulated crash."""
    from airpollution_tpu.io import read_meta, train_with_checkpoints

    args = dict(batch_sizes={"pde": 64, "ic": 16, "bc": 16}, epochs=40,
                lr=1e-3, lambda_weights={"pde": 1.0, "ic": 1.0, "bc": 1.0})
    ckpt = str(tmp_path / "ck")

    m1 = PINN([3, 8, 1], Problem(), Domain(), activation="tanh", seed=0)
    train_with_checkpoints(m1, ckpt_dir=ckpt, checkpoint_every=10, **args)
    assert read_meta(ckpt)["step"] == 40
    assert len(m1.history["total_loss"]) == 40

    # "Crash" after epoch 40 of an 80-epoch run: a fresh process resumes.
    m2 = PINN([3, 8, 1], Problem(), Domain(), activation="tanh", seed=1)
    args80 = dict(args, epochs=80)
    train_with_checkpoints(m2, ckpt_dir=ckpt, checkpoint_every=10, **args80)
    assert read_meta(ckpt)["step"] == 80
    # Only the remaining 40 epochs were run in this process.
    assert len(m2.history["total_loss"]) == 40


def test_checkpoint_rejects_wrong_shapes(tmp_path):
    """Loading a checkpoint from a different model size fails loudly."""
    import jax
    from airpollution_tpu.models.pinn import init_mlp_params

    small = init_mlp_params(jax.random.PRNGKey(0), [3, 8, 1], "tanh")
    big = init_mlp_params(jax.random.PRNGKey(0), [3, 16, 1], "tanh")
    path = str(tmp_path / "p.npz")
    save_pytree(path, small)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shape"):
        load_pytree(path, big)


def test_legacy_carry_checkpoint_migration(tmp_path):
    """A carry saved before TrainState grew (lam_ic, lam_bc, step) — three
    trailing scalar leaves — must still load, keeping fresh defaults for
    the new fields."""
    import numpy as np
    import jax

    from airpollution_tpu.io import checkpoint as ckpt
    from airpollution_tpu.models.pinn import PINN
    from airpollution_tpu.problems import Domain, Problem

    model = PINN([3, 8, 1], Problem(), Domain(), activation="tanh", seed=3)
    args = ({"pde": 32, "ic": 8, "bc": 8}, 3, 1e-3,
            {"pde": 1.0, "ic": 1.0, "bc": 1.0})
    model.train(*args)
    ckpt.save_pinn(str(tmp_path), model)

    # Rewrite the carry as the legacy format: drop the 3 trailing leaves
    # and invalidate the structure descriptor.
    carry = str(tmp_path / "carry_latest.npz")
    data = dict(np.load(carry))
    n = len(data)
    for i in (n - 1, n - 2, n - 3):
        del data[f"leaf_{i}"]
    np.savez(carry, **data)
    with open(carry + ".tree", "w") as f:
        f.write("legacy-structure")

    model2 = PINN([3, 8, 1], Problem(), Domain(), activation="tanh", seed=4)
    model2.train(*args)  # materialize carry structure
    lam_before = float(model2._carry_state.lam_ic)
    ckpt.load_pinn(str(tmp_path), model2)
    # Prefix restored from disk, new fields kept from the live state.
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(model2._carry_state.params)[0]),
        np.asarray(jax.tree.leaves(model.params)[0]),
    )
    assert float(model2._carry_state.lam_ic) == lam_before


def test_load_pytree_missing_tree_wrong_count_raises_valueerror(tmp_path):
    """Leaf-count mismatch must be ValueError even when the .tree
    descriptor is missing — _load_carry_with_migration catches ValueError
    to migrate legacy carries (a raw NpzFile KeyError would crash
    resume)."""
    import numpy as np
    import pytest
    from airpollution_tpu.io.checkpoint import load_pytree, save_pytree

    import os

    path = str(tmp_path / "ck.npz")
    save_pytree(path, {"a": np.zeros(3)})
    os.remove(path + ".tree")
    with pytest.raises(ValueError, match="leaf count"):
        load_pytree(path, {"a": np.zeros(3), "b": np.zeros(2),
                           "c": np.zeros(1)})


def test_save_pinn_epoch_records_resume_point(tmp_path):
    """save_pinn(epoch=N) writes the resume epoch in the same (atomic)
    meta write as the weights — no post-hoc patch window."""
    from airpollution_tpu.io.checkpoint import read_meta, save_pinn
    from airpollution_tpu.models.pinn import PINN
    from airpollution_tpu.problems import Domain, Problem

    model = PINN([3, 4, 1], Problem(), Domain(), activation="tanh", seed=0)
    save_pinn(str(tmp_path), model, step=None, epoch=1500)
    meta = read_meta(str(tmp_path))
    assert meta["step"] == 1500
    assert not list(tmp_path.glob("*.tmp*"))  # atomic renames completed
