"""Tests for batched physics diagnostics against loop oracles and physics
invariants (SURVEY.md section 4, oracle class 4)."""

import numpy as np
import jax.numpy as jnp

from airpollution_tpu.diagnostics import (
    center_of_mass_over_time,
    mass_over_time,
    peak_tracking,
    quadrature_weights,
    variance_over_time,
)
from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import Domain, SquarePulseProblem


def _setup(ms=16, nt=32):
    domain = Domain()
    md = MeshData(create_mesh(ms, 20.0), domain, nt=nt, dtype=jnp.float64)
    problem = SquarePulseProblem()
    solver = CRBESolver(domain, problem, md, solver_tol=1e-11)
    solver.solve()
    return domain, md, problem, solver


def test_quadrature_weights_match_triangle_loop():
    """w from segment_sum equals the reference's per-triangle area/3
    accumulation (analysis2.py:73-90) done literally."""
    _, md, _, _ = _setup(ms=8, nt=4)
    w = np.asarray(quadrature_weights(md))
    expect = np.zeros(md.number_of_segments)
    t2s = np.asarray(md.triangle_to_segments)
    areas = np.asarray(md.triangle_areas)
    for t in range(md.number_of_triangles):
        for a in range(3):
            expect[t2s[t, a]] += areas[t] / 3
    np.testing.assert_allclose(w, expect, rtol=1e-12)
    # Weights integrate constants exactly: sum w = domain area.
    assert np.isclose(w.sum(), 40.0 * 40.0)


def test_batched_moments_match_loop_oracle():
    """Batched mass/COM/variance equal the reference's per-triangle loops
    executed literally on one timestep."""
    _, md, _, solver = _setup(ms=8, nt=8)
    U = np.asarray(solver.solutions)
    w = np.asarray(quadrature_weights(md))
    mid = np.asarray(md.midpoints)
    t2s = np.asarray(md.triangle_to_segments)
    areas = np.asarray(md.triangle_areas)

    i = 4  # arbitrary timestep
    mass = moment_x = 0.0
    for t in range(md.number_of_triangles):
        segs = t2s[t]
        mass += areas[t] * np.sum(U[i, segs]) / 3
        moment_x += areas[t] * np.sum(U[i, segs] * mid[segs, 0]) / 3
    com_x_expect = moment_x / mass

    var_acc = 0.0
    for t in range(md.number_of_triangles):
        segs = t2s[t]
        var_acc += areas[t] * np.sum(
            U[i, segs] * (mid[segs, 0] - com_x_expect) ** 2
        ) / 3
    var_x_expect = var_acc / mass

    masses = np.asarray(mass_over_time(jnp.asarray(U), jnp.asarray(w)))
    com_x, com_y, _ = center_of_mass_over_time(
        jnp.asarray(U), jnp.asarray(w), md.midpoints
    )
    var_x, var_y = variance_over_time(
        jnp.asarray(U), jnp.asarray(w), md.midpoints
    )
    np.testing.assert_allclose(masses[i], mass, rtol=1e-10)
    np.testing.assert_allclose(float(com_x[i]), com_x_expect, rtol=1e-10)
    np.testing.assert_allclose(float(var_x[i]), var_x_expect, rtol=1e-10)


def test_physics_invariants_square_pulse():
    """Physics oracles over the pre-boundary window t <= 5 (the pulse is
    advected into the absorbing x=20 boundary near t=10, so late-time mass
    loss is genuine outflow, not an error): mass approximately conserved,
    COM advects with the wind (v=(1,0): y stays ~10), x-variance grows."""
    domain, md, problem, solver = _setup(ms=32, nt=64)
    U = jnp.asarray(solver.solutions)
    w = quadrature_weights(md)
    times = np.asarray(md.time_discr)
    half = len(times) // 2  # t <= 5

    masses = np.asarray(mass_over_time(U, w))
    assert abs(masses[0] - 16.0) / 16.0 < 0.1  # pulse mass = 4x4x1
    assert abs(masses[half] - masses[0]) / masses[0] < 0.05

    com_x, com_y, _ = center_of_mass_over_time(U, w, md.midpoints)
    com_x, com_y = np.asarray(com_x), np.asarray(com_y)
    theory_x = 10.0 + 1.0 * times
    assert np.max(np.abs(com_x[:half] - theory_x[:half])) < 0.5
    assert np.max(np.abs(com_y[:half] - 10.0)) < 0.5

    var_x, _ = variance_over_time(U, w, md.midpoints)
    var_x = np.asarray(var_x)
    theory_var = (12 - 8) ** 2 / 12 + 2 * 0.1 * times
    assert var_x[half] > var_x[0]  # spreading grows pre-boundary
    assert np.max(np.abs(var_x[:half] - theory_var[:half])) < 0.5


def test_peak_tracking_shapes_and_decay():
    _, md, _, solver = _setup(ms=16, nt=16)
    peaks, locs = peak_tracking(jnp.asarray(solver.solutions), md.midpoints)
    assert peaks.shape == (16,)
    assert locs.shape == (16, 2)
    assert float(peaks[-1]) < float(peaks[0])  # diffusion decays the peak


def test_analysis_aligns_times_with_strided_snapshots():
    """A solver built with snapshot_every=k yields a (nt-1)/k+1-row
    trajectory; ComprehensiveAnalysis must emit times arrays of the SAME
    length (advisor finding, round 1: times were silently longer)."""
    from airpollution_tpu.diagnostics import ComprehensiveAnalysis
    from airpollution_tpu.models.pinn import PINN

    domain = Domain()
    md = MeshData(create_mesh(8, 20.0), domain, nt=9, dtype=jnp.float64)
    problem = SquarePulseProblem()
    solver = CRBESolver(domain, problem, md, solver_tol=1e-11,
                        snapshot_every=2)
    solver.solve()
    assert solver.solutions.shape[0] == 5  # (9-1)/2 + 1
    model = PINN([3, 4, 1], problem, domain, activation="tanh", seed=0)
    ana = ComprehensiveAnalysis(problem, domain, md, solver, model)
    mc = ana.compute_mass_conservation()
    assert mc["times"].shape == mc["crbe_masses"].shape == (5,)
    np.testing.assert_allclose(mc["times"], np.asarray(md.time_discr)[::2])
    com = ana.compute_center_of_mass_tracking()
    assert com["times"].shape == com["crbe_com_x"].shape == (5,)
    profiles = ana.compute_concentration_profiles()
    # Profile labels come from the SNAPSHOT times, not the full discr.
    assert set(profiles) <= {f"t_{t:.1f}"
                             for t in np.asarray(md.time_discr)[::2]}
