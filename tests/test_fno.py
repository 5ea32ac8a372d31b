"""Fourier Neural Operator surrogate (models/fno.py) — third model
family, beyond the reference's FEM-vs-PINN pair (pinn.py:148-300).

Oracles:
- the cell-center grid view is a bijection onto the diagonal-edge DOFs
  and its coordinates are exact cell centers;
- the spectral convolution is translation-equivariant (cyclic shifts
  commute with it — the defining FNO property);
- the solver-manufactured dataset agrees sample-for-sample with a
  serial CRBESolver run;
- ShiftedPlumeProblem is an exact translation of the reference plume;
- short training fits a small dataset (loss drops 10x, rel-L2 < 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import airpollution_tpu as apt
from airpollution_tpu.models import fno
from airpollution_tpu.problems import Domain, Problem, ShiftedPlumeProblem


def _md(ms=17, nt=16):
    return apt.MeshData(apt.create_mesh(ms, 20.0), Domain(), nt=nt)


def test_cell_center_grid_bijection_and_coords():
    md = _md(9)
    grid = fno.cell_center_index_grid(md)
    assert grid.shape == (8, 8)
    assert len(np.unique(grid)) == grid.size
    coords = fno.grid_coordinates(md)
    h = 40.0 / 8
    xs = -20.0 + (np.arange(8) + 0.5) * h
    np.testing.assert_allclose(coords[3, :, 0], xs, atol=1e-5)
    np.testing.assert_allclose(coords[:, 2, 1], xs, atol=1e-5)


def test_spectral_conv_translation_equivariance():
    key = jax.random.PRNGKey(0)
    p = fno.init_fno_params(key, in_ch=3, modes=5, width=8, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8))
    y = fno._spectral_conv(x, p.w1_re[0], p.w1_im[0],
                           p.w2_re[0], p.w2_im[0])
    xs = jnp.roll(x, (3, -5), axis=(1, 2))
    ys = fno._spectral_conv(xs, p.w1_re[0], p.w1_im[0],
                            p.w2_re[0], p.w2_im[0])
    np.testing.assert_allclose(np.asarray(jnp.roll(y, (3, -5),
                                                   axis=(1, 2))),
                               np.asarray(ys), atol=1e-4)


def test_shifted_plume_is_exact_translation():
    base = Problem(v=(0.7, -0.3), D=0.2, sigma=1.3)
    shifted = ShiftedPlumeProblem(v=(0.7, -0.3), D=0.2, sigma=1.3,
                                  center=(2.5, -4.0))
    pts = jax.random.uniform(jax.random.PRNGKey(0), (50, 3),
                             minval=-10, maxval=10)
    pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) / 2.0)
    moved = pts.at[:, 0].add(2.5).at[:, 1].add(-4.0)
    np.testing.assert_allclose(
        np.asarray(shifted.analytical_solution(moved)),
        np.asarray(base.analytical_solution(pts)), rtol=1e-6)
    # Pytree roundtrip keeps the center leaves traced.
    leaves, treedef = jax.tree_util.tree_flatten(shifted)
    q = jax.tree_util.tree_unflatten(treedef, leaves)
    assert float(q.cx) == 2.5 and float(q.cy) == -4.0


def test_dataset_matches_serial_solver():
    from airpollution_tpu.models.crbe import CRBESolver

    md = _md(13, nt=10)
    X, Y, probs = fno.make_plume_dataset(md, Domain(),
                                         jax.random.PRNGKey(3), 3)
    assert X.shape == (3, 12, 12, 6) and Y.shape == (3, 12, 12, 1)
    grid = fno.cell_center_index_grid(md).reshape(-1)
    s = CRBESolver(Domain(), probs[1], md)
    s.solve(store_solutions=False)
    ref = np.asarray(s.solutions[-1])[grid].reshape(12, 12)
    np.testing.assert_allclose(np.asarray(Y[1, ..., 0]), ref, atol=1e-5)
    # IC channel = the problem's own initial condition on the grid.
    ic = np.asarray(probs[1].initial_condition_fn(md.midpoints))[grid]
    np.testing.assert_allclose(np.asarray(X[1, ..., 0]),
                               ic.reshape(12, 12), atol=1e-6)


def test_time_dataset_matches_serial_snapshots():
    from airpollution_tpu.models.crbe import CRBESolver

    md = _md(13, nt=9)
    X, Y, probs, times = fno.make_plume_time_dataset(
        md, Domain(), jax.random.PRNGKey(3), 5, n_times=4, chunk=2)
    # 5 problems x 4 times, 7 channels (ic, D, vx, vy, x, y, t/T).
    assert X.shape == (20, 12, 12, 7) and Y.shape == (20, 12, 12, 1)
    np.testing.assert_allclose(times, Domain().T * np.arange(1, 5) / 4)
    grid = fno.cell_center_index_grid(md).reshape(-1)
    s = CRBESolver(Domain(), probs[3], md, snapshot_every=2)
    s.solve()
    # Problem 3 (second chunk, exercising chunking+padding), time j=2.
    row = 3 * 4 + 1
    ref = np.asarray(s.solutions[2])[grid].reshape(12, 12)
    np.testing.assert_allclose(np.asarray(Y[row, ..., 0]), ref,
                               atol=1e-5)
    # Time channel is constant per row and equals t/T.
    tch = np.asarray(X[row, ..., 6])
    np.testing.assert_allclose(tch, times[1] / Domain().T, atol=1e-6)
    # IC channel is the t=0 field regardless of the row's time.
    ic = np.asarray(probs[3].initial_condition_fn(md.midpoints))[grid]
    np.testing.assert_allclose(np.asarray(X[row, ..., 0]),
                               ic.reshape(12, 12), atol=1e-6)


def test_dataset_sharded_generation_matches_serial():
    from airpollution_tpu.parallel import make_mesh

    md = _md(13, nt=8)
    X0, Y0, _ = fno.make_plume_dataset(md, Domain(),
                                       jax.random.PRNGKey(9), 5)
    mesh = make_mesh({"trial": 4})
    X1, Y1, _ = fno.make_plume_dataset(md, Domain(),
                                       jax.random.PRNGKey(9), 5,
                                       mesh=mesh)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X0), atol=1e-6)


def test_time_dataset_validation():
    md = _md(9, nt=9)
    with pytest.raises(ValueError, match="must divide"):
        fno.make_plume_time_dataset(md, Domain(), jax.random.PRNGKey(0),
                                    2, n_times=3)


def test_dp_training_matches_serial():
    """Sharded trainer == serial trainer (same key) to float
    reassociation: the psum'd global loss replays the exact serial
    batch-mean, so parameters track step for step."""
    from airpollution_tpu.parallel import make_mesh
    from airpollution_tpu.parallel.fno_parallel import train_fno_dp

    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (24, 16, 16, 4), jnp.float32)
    Y = jax.random.normal(jax.random.fold_in(key, 1), (24, 16, 16, 1),
                          jnp.float32)
    params = fno.init_fno_params(jax.random.PRNGKey(1), in_ch=4,
                                 modes=4, width=8, depth=2, proj=16)
    kt = jax.random.PRNGKey(5)
    p_ser, _, l_ser = fno.train_fno(params, X, Y, epochs=4, batch=8,
                                    lr=1e-3, key=kt)
    mesh = make_mesh({"data": 4})
    p_dp, opt_dp, l_dp = train_fno_dp(mesh, params, X, Y, epochs=4,
                                      batch=8, lr=1e-3, key=kt)
    # Step-1 loss is computed BEFORE any update: exact agreement here
    # proves the sharded batch reconstruction replays the serial draw.
    np.testing.assert_allclose(float(l_dp[0]), float(l_ser[0]),
                               rtol=1e-6)
    # Later steps drift by float reassociation only (psum'd f32 grads
    # through Adam's step-1 g/|g| sign sensitivity) — close, not bitwise.
    np.testing.assert_allclose(np.asarray(l_dp), np.asarray(l_ser),
                               rtol=1e-2)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_ser)):
        # Per-param drift between the two runs is bounded by 2*lr per
        # step (each Adam update has magnitude ~lr; worst case they
        # anti-align); sharding bugs produce O(1) divergence instead.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2 * 4 * 1e-3 * 1.25)
    # Continuation threading opt_state stays healthy and finite.
    p2, _, l2 = train_fno_dp(mesh, p_dp, X, Y, epochs=3, batch=8,
                             lr=5e-4, key=jax.random.PRNGKey(6),
                             opt_state=opt_dp)
    assert np.isfinite(np.asarray(l2)).all()
    with pytest.raises(ValueError, match="not divisible"):
        train_fno_dp(mesh, params, X, Y, epochs=1, batch=6)


def test_training_fits_small_dataset():
    md = _md(17, nt=12)
    X, Y, _ = fno.make_plume_dataset(md, Domain(),
                                     jax.random.PRNGKey(7), 16)
    params = fno.init_fno_params(jax.random.PRNGKey(1), in_ch=6,
                                 modes=6, width=16, depth=3, proj=32)
    params, _, losses = fno.train_fno(params, X, Y, epochs=300,
                                      batch=8, lr=2e-3,
                                      key=jax.random.PRNGKey(2))
    assert float(losses[-1]) < 0.1 * float(losses[0])
    assert fno.relative_l2(params, X, Y) < 1.0
    assert np.isfinite(np.asarray(losses)).all()
