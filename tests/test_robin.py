"""Robin / deposition boundary conditions.

Beyond the reference (all-sides Dirichlet, crbe.py:397-404): the flux law
``-D dc/dn = alpha c - g`` on named box sides (problems.AdDifProblem.
robin_sides). For the CR element the basis function is identically 1
along its own edge and every other basis function integrates to zero
there, so the boundary integrals are exactly diagonal — alpha * |e| folds
into the spatial operator at assembly (models/crbe.robin_terms) and the
g-load is a one-point edge quadrature in the RHS.

Oracles:
- alpha = 0 on every side = homogeneous Neumann: with v = 0 the lumped
  total mass is exactly conserved (1^T K = 0 for the symmetric stiffness
  because CR reproduces constants).
- alpha > 0 (deposition): mass decreases monotonically.
- Manufactured solution: the Gaussian plume with g = alpha c_ex +
  D dc_ex/dn (problems.exact_robin_g, normal derivative by autodiff)
  keeps the exact solution; errors converge under refinement.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.mesh.data import boundary_side_masks
from airpollution_tpu.models.crbe import CRBESolver, robin_terms
from airpollution_tpu.problems import (Domain, Problem, SquarePulseProblem,
                                       exact_robin_g)

ALL_NEUMANN = {"left": 0.0, "right": 0.0, "bottom": 0.0, "top": 0.0}


def _mass(solver):
    m = solver.global_mass_diag
    return jnp.asarray([jnp.sum(m * u) for u in solver.solutions])


def test_side_masks_partition_boundary():
    domain = Domain()
    md = MeshData(create_mesh(8, 20.0), domain, nt=4, dtype=jnp.float64)
    masks = boundary_side_masks(md)
    union = np.zeros(md.number_of_segments, bool)
    total = 0
    for side in ("left", "right", "bottom", "top"):
        m = np.asarray(masks[side])
        assert m.sum() == 7  # n-1 boundary edges per side of an n-grid
        total += m.sum()
        union |= m
    # Sides are disjoint (edge midpoints are never at a corner) and
    # exactly cover the geometric boundary set.
    assert total == int(np.asarray(md.boundary_mask).sum())
    assert (union == np.asarray(md.boundary_mask)).all()


def test_robin_terms_reduce_dirichlet_set():
    domain = Domain()
    md = MeshData(create_mesh(6, 20.0), domain, nt=4, dtype=jnp.float64)
    p = SquarePulseProblem()
    p.robin_sides = {"bottom": 0.3}
    dmask, rmask, alpha = robin_terms(md, p)
    masks = boundary_side_masks(md)
    assert (np.asarray(rmask) == np.asarray(masks["bottom"])).all()
    assert not np.asarray(dmask & rmask).any()
    assert (np.asarray(dmask | rmask) == np.asarray(md.boundary_mask)).all()
    # alpha * |e| on Robin DOFs only.
    lengths = np.asarray(md.segment_lengths)
    expect = np.where(np.asarray(rmask), 0.3 * lengths, 0.0)
    np.testing.assert_allclose(np.asarray(alpha), expect, rtol=1e-12)
    p_bad = SquarePulseProblem()
    p_bad.robin_sides = {"ground": 0.3}
    with pytest.raises(ValueError, match="unknown robin_sides"):
        robin_terms(md, p_bad)


def test_neumann_closed_box_conserves_mass():
    """v=0, alpha=0 everywhere: pure diffusion in a no-flux box. The
    discrete scheme conserves the lumped total mass exactly (up to the
    Krylov tolerance) because 1^T M u^{n+1} = 1^T M u^n when 1^T K = 0."""
    domain = Domain(T=2.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=17, dtype=jnp.float64)
    p = SquarePulseProblem(v=(0.0, 0.0), D=0.5)
    p.robin_sides = dict(ALL_NEUMANN)
    solver = CRBESolver(domain, p, md, solver_tol=1e-12)
    solver.solve()
    mass = np.asarray(_mass(solver))
    np.testing.assert_allclose(mass, mass[0], rtol=1e-8)
    # And the field genuinely diffused (not a frozen no-op).
    assert float(jnp.max(solver.solutions[-1])) < float(
        jnp.max(solver.solutions[0])
    )


def test_deposition_removes_mass_monotonically():
    domain = Domain(T=2.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=17, dtype=jnp.float64)
    # Pulse touching the right/top walls so the deposition flux is
    # immediately active.
    p = SquarePulseProblem(v=(0.0, 0.0), D=1.0, lo=10.0, hi=20.0)
    p.robin_sides = {s: 0.5 for s in ALL_NEUMANN}
    solver = CRBESolver(domain, p, md, solver_tol=1e-12)
    solver.solve()
    mass = np.asarray(_mass(solver))
    assert (np.diff(mass) <= 1e-12).all()
    assert mass[-1] < 0.99 * mass[0]


class _RobinPlume(Problem):
    """Gaussian plume with a deposition-style Robin law on the outflow
    wall, closed by the manufactured g so the exact solution is kept."""

    robin_sides = {"right": 0.7}

    def robin_g(self, xy, t, side):
        return exact_robin_g(self, xy, t, side)


def test_robin_mms_matches_exact_solution_and_converges():
    domain = Domain()
    errs = {}
    for ms in (8, 16):
        md = MeshData(create_mesh(ms, 20.0), domain, nt=33,
                      dtype=jnp.float64)
        p = _RobinPlume(v=(1.6, 0.0), D=0.1)
        solver = CRBESolver(domain, p, md, time_scheme_order=2,
                            solver_tol=1e-12)
        solver.solve()
        errs[ms] = solver.compute_errors(p.analytical_solution)[0]

        # Baseline: the same problem all-Dirichlet — Robin must land in
        # the same accuracy regime, not merely "not blow up".
        pd = Problem(v=(1.6, 0.0), D=0.1)
        ref = CRBESolver(domain, pd, md, time_scheme_order=2,
                         solver_tol=1e-12)
        ref.solve()
        assert errs[ms] < 2.0 * ref.compute_errors(
            pd.analytical_solution)[0]
    assert errs[16] < 0.5 * errs[8]


def test_robin_rejected_on_fast_and_parallel_paths():
    domain = Domain(T=1.0)
    md = MeshData(create_mesh(6, 20.0), domain, nt=5, dtype=jnp.float64)
    p = SquarePulseProblem()
    p.robin_sides = {"bottom": 0.1}
    with pytest.raises(ValueError, match="ELL path"):
        CRBESolver(domain, p, md, matvec_impl="stencil")
    with pytest.raises(ValueError, match="full assembly"):
        CRBESolver(domain, p, md, assembly="patch")
    # 'auto' routes to ELL and solves.
    solver = CRBESolver(domain, p, md)
    assert solver.matvec_impl == "ell"
    from airpollution_tpu.models.pinn import PINN

    with pytest.raises(ValueError, match="FEM feature"):
        PINN([3, 8, 1], p, domain)


def test_robin_survives_problem_pytree_roundtrip():
    import jax

    p = SquarePulseProblem()
    p.robin_sides = {"bottom": 0.25, "top": 0.0}
    leaves, treedef = jax.tree_util.tree_flatten(p)
    q = jax.tree_util.tree_unflatten(treedef, leaves)
    assert q.robin_sides == p.robin_sides


def test_fit_deposition_recovers_velocities():
    """Recover two distinct wall deposition velocities from a 1%-noisy
    solution trajectory through the differentiable ELL solve (traced
    alpha override of the static robin_sides, inverse.fit_deposition)."""
    from airpollution_tpu.diagnostics import inverse

    domain = Domain(T=2.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=17, dtype=jnp.float64)
    truth = {"right": 0.6, "top": 0.15}
    p = SquarePulseProblem(v=(0.0, 0.0), D=1.0, lo=10.0, hi=20.0)
    p.robin_sides = dict(truth)
    idx = [4, 8, 12, 16]
    obs = inverse.solve_snapshots(p, md, indices=idx)
    rng = np.random.default_rng(0)
    obs = obs * (1.0 + 0.01 * rng.standard_normal(obs.shape))

    alphas, losses = inverse.fit_deposition(
        obs, md, p, alpha0=0.25, snapshot_indices=idx, steps=250, lr=0.05)
    assert losses[-1] < 0.1 * losses[0]
    for side, a_true in truth.items():
        assert abs(alphas[side] - a_true) / a_true < 0.08, (side, alphas)
