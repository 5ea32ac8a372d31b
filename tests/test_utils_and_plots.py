"""Tests for utils.profiling and the reporting plot functions."""

import os

import numpy as np

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.models.pinn import PINN
from airpollution_tpu.problems import Domain, Problem
from airpollution_tpu.reporting import plots
from airpollution_tpu.utils import Timer, get_cpu_memory_mb, memory_delta


def test_timer_and_rate():
    import time

    with Timer() as t:
        time.sleep(0.05)
    assert 0.04 < t.elapsed < 1.0
    assert t.rate(10) == 10 / t.elapsed


def test_memory_tracking():
    assert get_cpu_memory_mb() > 10  # a real process RSS
    with memory_delta() as mem:
        _ = np.zeros((1000, 1000))
    assert "cpu_memory_usage_MB" in mem
    assert "gpu_memory_usage_MB" in mem


def test_vertex_average_matches_loop():
    """Vectorized vertex averaging equals the reference loop
    (crbe.py:602-609)."""
    md = MeshData(create_mesh(5, 2.0), Domain(Lx=2, Ly=2, T=1), nt=2)
    rng = np.random.default_rng(0)
    vals = rng.normal(size=md.number_of_segments)
    got = plots.vertex_average(np.asarray(md.points), md.segments, vals)
    expect = np.zeros(md.number_of_points)
    count = np.zeros(md.number_of_points)
    for i, (a, b) in enumerate(np.asarray(md.segments)):
        expect[a] += vals[i]
        expect[b] += vals[i]
        count[a] += 1
        count[b] += 1
    expect /= np.maximum(count, 1)
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_final_state_only_solver_is_plottable(tmp_path):
    """store_solutions=False keeps only the final state; plotting it at
    the (default) final step index must work — the single stored row IS
    the final state — while intermediate indices raise with a pointer
    to store_solutions=True."""
    import pytest

    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(6, 20.0), domain, nt=4)
    solver = CRBESolver(domain, problem, md)
    solver.solve(store_solutions=False)
    d = str(tmp_path)
    solver.plot_solution(problem.analytical_solution, save_dir=d)
    assert any(f.startswith("solution_t3") for f in os.listdir(d))
    with pytest.raises(ValueError, match="store_solutions"):
        solver.plot_solution(problem.analytical_solution, time_index=1,
                             save_dir=d)


def test_device_memory_counts_per_device_shards():
    """A sharded array contributes only its local shard bytes to each
    device's total; a replicated one its full size (per device) — not
    n_dev x the global size (review finding, round 2)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import gc

    from airpollution_tpu.utils.profiling import get_device_memory_mb

    mesh = Mesh(np.array(jax.devices()), ("x",))
    # Large enough that stray small buffers from OTHER tests (deferred
    # deletions collected by the gc.collect()s below) stay inside the
    # tolerance — at the original 16 KB shard this test was flaky in
    # full-suite runs.
    nbytes = 8 * 262144 * 4
    gc.collect()
    base_before = get_device_memory_mb()
    src = jnp.ones((8, 262144), jnp.float32)
    sharded = jax.device_put(src, NamedSharding(mesh, P("x")))
    del src
    gc.collect()  # drop the full-size single-device temporary
    with_sharded = get_device_memory_mb()
    del sharded
    gc.collect()
    base_after = get_device_memory_mb()
    # Device 0 held exactly its 1/8th shard of the sharded array — the
    # old accounting charged the full global nbytes to every device.
    # Either baseline may be polluted by unrelated frees; accept the one
    # that brackets the allocation.
    expected = nbytes / 8 / 1e6
    deltas = (with_sharded - base_after, with_sharded - base_before)
    assert any(abs(d - expected) < 0.05 * expected for d in deltas), (
        deltas, expected
    )


def test_solver_and_pinn_plots_write_files(tmp_path):
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(6, 20.0), domain, nt=4)
    solver = CRBESolver(domain, problem, md)
    solver.solve()
    d = str(tmp_path)
    solver.plot_solution(problem.analytical_solution, save_dir=d)
    solver.plot_interpolated_solution(problem.analytical_solution,
                                      save_dir=d, name="t")
    solver.plot_error_evolution(
        {"l2_errors": np.ones(md.nt), "linf_errors": np.ones(md.nt)},
        save_dir=d,
    )
    model = PINN([3, 4, 1], problem, domain, activation="tanh")
    model.train({"pde": 16, "ic": 8, "bc": 8}, 2, 1e-3,
                {"pde": 1.0, "ic": 1.0, "bc": 1.0})
    model.plot_history(save_dir=d, name="t")
    model.plot_solution(1.0, md, problem.analytical_solution, save_dir=d)
    model.plot_interpolated_solution(1.0, md, problem.analytical_solution,
                                     save_dir=d, name="t")
    made = os.listdir(d)
    assert any(f.startswith("solution_t3") for f in made)
    assert "error_evolution.png" in made
    assert any(f.startswith("loss_history") for f in made)
    assert len([f for f in made if f.endswith(".png")]) >= 5


def test_exceedance_and_footprint_plots_write_files(tmp_path):
    import jax.numpy as jnp

    from airpollution_tpu.diagnostics import (ensemble_forecast,
                                              receptor_footprint)

    domain = Domain(T=2.0)
    md = MeshData(create_mesh(8, 20.0), domain, nt=9, dtype=jnp.float64)
    out = ensemble_forecast(md, domain,
                            [Problem(D=d) for d in (0.05, 0.1, 0.3)],
                            thresholds=(0.01, 0.05))
    p1 = plots.plot_exceedance_maps(md, out["exceedance"], (0.01, 0.05),
                                    save_dir=str(tmp_path))
    F = receptor_footprint(md, domain, Problem(v=(1.0, 0.0), D=0.2), [7])
    p2 = plots.plot_footprint(md, F[0], 7, save_dir=str(tmp_path))
    assert os.path.exists(p1) and os.path.getsize(p1) > 0
    assert os.path.exists(p2) and os.path.getsize(p2) > 0
