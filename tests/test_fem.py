"""Tests for the CR FEM path: local matrices, assembly, time stepping."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import (
    CRBESolver,
    ElementCR,
    assemble,
    local_matrices,
)
from airpollution_tpu.problems import Domain, Problem


def _f64(x):
    return jnp.asarray(x, dtype=jnp.float64)


def test_local_matrices_unit_triangle():
    """On the unit reference triangle (J = I) the stiffness equals the
    analytic reference-element matrix (crbe.py:205-210) and mass is
    area/3 per DOF (reference mass I/6 x 2*area, crbe.py:280-282)."""
    verts = _f64([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    areas = _f64([0.5])
    loc = local_matrices(verts, areas, D=1.0, v=jnp.zeros(2))
    expect_K = ElementCR().get_stiffness_matrix()  # D*area*G@G^T on J=I
    np.testing.assert_allclose(np.asarray(loc.stiffness[0]), expect_K, atol=1e-12)
    np.testing.assert_allclose(np.asarray(loc.mass_diag[0]), [1 / 6] * 3)


def test_stiffness_correct_convention_hand_computed():
    """Stretched triangle (0,0),(h,0),(h,h): CR gradients are
    g0=(2/h,0), g1=(-2/h,2/h), g2=(0,-2/h) so K = area*[gi.gj] =
    [[2,-2,0],[-2,4,-2],[0,-2,2]]. The reference's transposed convention
    gives a different (wrong) matrix — both are checked."""
    h = 2.0
    verts = _f64([[[0.0, 0.0], [h, 0.0], [h, h]]])
    areas = _f64([h * h / 2])
    loc = local_matrices(verts, areas, D=1.0, v=jnp.zeros(2))
    np.testing.assert_allclose(
        np.asarray(loc.stiffness[0]),
        [[2, -2, 0], [-2, 4, -2], [0, -2, 2]],
        atol=1e-12,
    )
    loc_ref = local_matrices(
        verts, areas, D=1.0, v=jnp.zeros(2), stiffness_convention="reference"
    )
    np.testing.assert_allclose(
        np.asarray(loc_ref.stiffness[0]),
        [[2, 0, -2], [0, 2, -2], [-2, -2, 4]],
        atol=1e-12,
    )


def test_advection_local_matrix():
    """A[i,j] = (area/3) * (v . g_j) with correct physical gradients;
    rows are identical and row sums vanish (sum_j g_j = 0)."""
    h = 1.0
    verts = _f64([[[0.0, 0.0], [h, 0.0], [h, h]]])
    areas = _f64([0.5])
    v = jnp.asarray([1.0, 0.5])
    loc = local_matrices(verts, areas, D=1.0, v=v)
    A = np.asarray(loc.advection[0])
    g = np.array([[2, 0], [-2, 2], [0, -2]], dtype=float)  # physical grads
    expect = (0.5 / 3) * np.outer(np.ones(3), g @ np.asarray(v))
    np.testing.assert_allclose(A, expect, atol=1e-12)
    np.testing.assert_allclose(A.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize("convention", ["correct", "reference"])
def test_assembly_matches_dense_oracle(convention):
    """Global ELL assembly equals a dense loop assembly of the same local
    matrices (oracle for the segment_sum scatter, crbe.py:326-354)."""
    domain = Domain(Lx=2.0, Ly=2.0, T=1.0)
    md = MeshData(create_mesh(4, 2.0), domain, nt=8, dtype=jnp.float64)
    problem = Problem(v=(1.0, 0.5), D=0.1)
    dt = domain.T / (md.nt - 1)
    ops = assemble(md, problem, dt, 1, convention)

    verts = md.points[md.triangles]
    loc = local_matrices(verts, md.triangle_areas, problem.D, problem.v,
                         convention)
    n = md.number_of_segments
    t2s = np.asarray(md.triangle_to_segments)
    K_d = np.zeros((n, n))
    A_d = np.zeros((n, n))
    M_d = np.zeros(n)
    for t in range(len(t2s)):
        for a in range(3):
            M_d[t2s[t, a]] += float(loc.mass_diag[t, a])
            for b in range(3):
                K_d[t2s[t, a], t2s[t, b]] += float(loc.stiffness[t, a, b])
                A_d[t2s[t, a], t2s[t, b]] += float(loc.advection[t, a, b])

    def ell_to_dense(E):
        out = np.zeros((n, n))
        vals, cols = np.asarray(E.vals), np.asarray(E.cols)
        for r in range(n):
            for k in range(vals.shape[1]):
                out[r, cols[r, k]] += vals[r, k]
        return out

    np.testing.assert_allclose(ell_to_dense(ops.stiffness), K_d, atol=1e-12)
    np.testing.assert_allclose(ell_to_dense(ops.advection), A_d, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ops.mass_diag), M_d, atol=1e-12)

    # Masked system: boundary rows are identity.
    S = ell_to_dense(ops.system)
    bmask = np.asarray(md.boundary_mask)
    S_expect = np.diag(M_d) + dt * (K_d + A_d)
    S_expect[bmask, :] = 0.0
    S_expect[bmask, bmask] = 1.0
    np.testing.assert_allclose(S, S_expect, atol=1e-12)


def test_time_stepping_matches_scipy_direct_solve():
    """3 steps of the scan match an explicit scipy spsolve oracle doing the
    reference per-step algebra (crbe.py:383-404, :426-429) on the same
    matrices."""
    domain = Domain(Lx=2.0, Ly=2.0, T=0.5)
    md = MeshData(create_mesh(6, 2.0), domain, nt=4, dtype=jnp.float64)
    problem = Problem(v=(1.0, 0.5), D=0.1)
    solver = CRBESolver(domain, problem, md, solver_tol=1e-13,
                        solver_maxiter=500)
    sols = np.asarray(solver.solve())

    ops = solver._ops
    n = md.number_of_segments
    vals, cols = np.asarray(ops.system.vals), np.asarray(ops.system.cols)
    rows = np.repeat(np.arange(n), vals.shape[1])
    S = sps.csr_matrix((vals.ravel(), (rows, cols.ravel())), shape=(n, n))
    M_d = np.asarray(ops.mass_diag)
    bmask = np.asarray(md.boundary_mask)
    mid = np.asarray(md.midpoints)
    dt = solver.dt

    u = np.asarray(problem.initial_condition_fn(md.midpoints))
    expect = [u]
    for step in range(1, md.nt):
        t = step * dt
        b = M_d * u
        b += dt * np.asarray(
            problem.source_term(jnp.asarray(np.hstack([mid, np.full((n, 1), t)])))
        )
        b[bmask] = 0.0
        u = spla.spsolve(S.tocsc(), b)
        lift = np.zeros(n)
        xyt = np.hstack([mid, np.full((n, 1), t)])
        bc = np.asarray(problem.boundary_fn(jnp.asarray(xyt)))
        lift[bmask] = bc[bmask]
        expect.append(u + lift)
    np.testing.assert_allclose(sols, np.asarray(expect), atol=1e-9)


@pytest.mark.parametrize("quadrature", ["mass_lumped", "reference"])
@pytest.mark.parametrize("order", [1, 2])
def test_sourced_time_stepping_matches_scipy_oracle(quadrature, order):
    """Nonzero source term against a scipy spsolve oracle, pinning BOTH
    source conventions: the corrected lumped-mass load
    dt*M*s (BE at t^{n+1}; CN the t^n/t^{n+1} trapezoid) and the
    reference's raw pointwise add dt*s(t^{n+1}) (defect D10,
    crbe.py:391-394)."""

    class SourcedProblem(Problem):
        zero_source = False

        def source_term(self, xyt):
            x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
            return 0.2 * jnp.exp(-(x**2 + y**2)) * (1.0 + 0.5 * t)

    domain = Domain(Lx=2.0, Ly=2.0, T=0.5)
    md = MeshData(create_mesh(6, 2.0), domain, nt=4, dtype=jnp.float64)
    problem = SourcedProblem(v=(1.0, 0.5), D=0.1)
    solver = CRBESolver(domain, problem, md, time_scheme_order=order,
                        solver_tol=1e-13, solver_maxiter=500,
                        source_quadrature=quadrature)
    sols = np.asarray(solver.solve())

    ops = solver._ops
    n = md.number_of_segments
    vals, cols = np.asarray(ops.system.vals), np.asarray(ops.system.cols)
    rows = np.repeat(np.arange(n), vals.shape[1])
    S = sps.csr_matrix((vals.ravel(), (rows, cols.ravel())), shape=(n, n))
    if order == 2:
        kv, kc = np.asarray(ops.ka.vals), np.asarray(ops.ka.cols)
        KA = sps.csr_matrix((kv.ravel(), (rows[:kv.size], kc.ravel())),
                            shape=(n, n))
    M_d = np.asarray(ops.mass_diag)
    bmask = np.asarray(md.boundary_mask)
    mid = np.asarray(md.midpoints)
    dt = solver.dt

    def s_at(t):
        return np.asarray(problem.source_term(
            jnp.asarray(np.hstack([mid, np.full((n, 1), t)]))))

    u = np.asarray(problem.initial_condition_fn(md.midpoints))
    expect = [u]
    for step in range(1, md.nt):
        t = step * dt
        b = M_d * u if order == 1 else M_d * u - 0.5 * dt * (KA @ u)
        if quadrature == "reference":
            b += dt * s_at(t)
        elif order == 1:
            b += dt * M_d * s_at(t)
        else:
            b += dt * M_d * 0.5 * (s_at(t) + s_at(t - dt))
        b[bmask] = 0.0
        u = spla.spsolve(S.tocsc(), b)
        lift = np.zeros(n)
        xyt = np.hstack([mid, np.full((n, 1), t)])
        bc = np.asarray(problem.boundary_fn(jnp.asarray(xyt)))
        lift[bmask] = bc[bmask]
        expect.append(u + lift)
    np.testing.assert_allclose(sols, np.asarray(expect), atol=1e-9)


def test_convergence_on_gaussian_problem():
    """rel-L2 decreases under refinement; "reference" convention reproduces
    the reference solver run on the *same* structured mesh (oracle values
    measured 2026-08-16 by executing /root/reference/crbe.py's BESCRFEM on
    this exact triangulation: rel_l2 = 1.741805 at ms=16, 0.787025 at ms=32,
    nt=128); the corrected stiffness convention is strictly more accurate."""
    domain = Domain()
    problem = Problem()
    oracle = {16: 1.741805, 32: 0.787025}
    for ms, expect in oracle.items():
        md = MeshData(create_mesh(ms, 20.0), domain, nt=128, dtype=jnp.float64)
        s = CRBESolver(domain, problem, md, solver_tol=1e-11,
                       stiffness_convention="reference")
        s.solve()
        rel_l2, _, _ = s.compute_errors(problem.analytical_solution)
        assert abs(rel_l2 - expect) < 1e-4, (ms, rel_l2)

        s_fix = CRBESolver(domain, problem, md, solver_tol=1e-11)
        s_fix.solve()
        rel_fix = s_fix.compute_errors(problem.analytical_solution)[0]
        assert rel_fix < rel_l2


def test_temporal_convergence_orders():
    """Backward Euler is O(dt), Crank-Nicolson O(dt^2): on a fixed mesh the
    distance to a fine-dt run must shrink ~2x (BE) / ~4x (CN) per dt halving
    (crbe.py:356-362 time schemes)."""
    domain = Domain()
    problem = Problem()
    mesh = create_mesh(8, 20.0)

    def final_state(nt, order):
        md = MeshData(mesh, domain, nt=nt, dtype=jnp.float64)
        s = CRBESolver(domain, problem, md, time_scheme_order=order,
                       solver_tol=1e-12, solver_maxiter=500)
        return np.asarray(s.solve()[-1])

    for order, lo, hi in ((1, 1.6, 2.4), (2, 3.0, 5.0)):
        ref = final_state(257, order)
        e1 = np.linalg.norm(final_state(17, order) - ref)
        e2 = np.linalg.norm(final_state(33, order) - ref)
        ratio = e1 / e2
        assert lo < ratio < hi, (order, ratio)


def test_invalid_scheme_order():
    domain = Domain()
    md = MeshData(create_mesh(4, 20.0), domain, nt=4)
    with pytest.raises(ValueError):
        CRBESolver(domain, Problem(), md, time_scheme_order=3)


def test_final_state_mode_matches_stored_last_row():
    """store_solutions=False returns the boundary-lifted final state —
    identical to solutions[-1] of a full store (lift-consistency)."""
    domain, problem = Domain(), Problem(sigma=15.0)  # boundary values != 0
    md = MeshData(create_mesh(10, 20.0), domain, nt=8, dtype=jnp.float64)
    s = CRBESolver(domain, problem, md, solver_tol=1e-12)
    full = np.asarray(s.solve(store_solutions=True))
    final = np.asarray(s.solve(store_solutions=False))
    np.testing.assert_allclose(final[0], full[-1], atol=1e-10)


def test_solve_fn_cache_honors_attribute_mutation():
    """Mutating solver attributes after a solve() must NOT reuse the stale
    compiled closure (advisor finding, round 1): the cache keys on the
    full config. snapshot_every changes the stored-trajectory shape, so a
    stale reuse is directly observable."""
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(8, 20.0), domain, nt=9, dtype=jnp.float64)
    s = CRBESolver(domain, problem, md, solver_tol=1e-11)
    assert s.solve().shape[0] == 9
    s.snapshot_every = 2
    assert s.solve().shape[0] == 5  # stale cache would return 9 rows
    s.snapshot_every = None
    assert s.solve().shape[0] == 9
    # A solver-method switch also rebuilds (different algorithm entirely).
    s.solver_method = "chebyshev"
    s.chebyshev_iters = 12
    sols_cheb = np.asarray(s.solve())
    assert sols_cheb.shape[0] == 9
