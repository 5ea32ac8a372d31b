"""First-order reaction/decay term (advection-diffusion-reaction).

The ``reaction`` rate r adds ``+ r c`` to the PDE — beyond the reference
(pure transport, utils/common.py:15-30). It is folded into the assembled
spatial operator as ``r M`` (models/crbe.assemble), so every solve path
inherits it; the PINN residual adds ``reaction * c``
(ops/autodiff.pde_residual). The Gaussian plume stays its own exact
oracle: its decayed solution is the plume times exp(-r t).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver, assemble
from airpollution_tpu.ops import autodiff
from airpollution_tpu.problems import Domain, Problem, SquarePulseProblem

R = 0.7


def test_analytical_solution_decays_exponentially():
    """Problem(reaction=r).analytical_solution == plume * exp(-r t):
    the decay commutes with the constant-coefficient transport operator,
    so exp(-r t) times the common.py:47-50 plume solves the reaction PDE."""
    xyt = jnp.asarray([[0.3, -0.2, 0.4], [1.0, 0.5, 1.0], [0.0, 0.0, 0.0]],
                      dtype=jnp.float64)
    base = Problem()
    decayed = Problem(reaction=R)
    np.testing.assert_allclose(
        np.asarray(decayed.analytical_solution(xyt)),
        np.asarray(base.analytical_solution(xyt))
        * np.exp(-R * np.asarray(xyt[:, 2])),
        rtol=1e-12,
    )


def test_assembly_folds_reaction_into_ka():
    """ops.ka == (K + A) + r * diag(M) and the masked system is
    M + c*dt*ka, checked against a dense oracle built from the r=0
    assembly (the fold is the ONLY difference)."""
    domain = Domain(Lx=2.0, Ly=2.0, T=1.0)
    md = MeshData(create_mesh(5, 2.0), domain, nt=8, dtype=jnp.float64)
    dt = domain.T / (md.nt - 1)
    n = md.number_of_segments

    def ell_to_dense(E):
        out = np.zeros((n, n))
        vals, cols = np.asarray(E.vals), np.asarray(E.cols)
        for r in range(n):
            for k in range(vals.shape[1]):
                out[r, cols[r, k]] += vals[r, k]
        return out

    for order, c in ((1, 1.0), (2, 0.5)):
        ops0 = assemble(md, Problem(), dt, order, "correct")
        ops_r = assemble(md, Problem(reaction=R), dt, order, "correct")
        M = np.asarray(ops0.mass_diag)
        ka_expect = ell_to_dense(ops0.ka) + R * np.diag(M)
        np.testing.assert_allclose(ell_to_dense(ops_r.ka), ka_expect,
                                   atol=1e-12)
        S_expect = np.diag(M) + c * dt * ka_expect
        bmask = np.asarray(md.boundary_mask)
        S_expect[bmask, :] = 0.0
        S_expect[bmask, bmask] = 1.0
        np.testing.assert_allclose(ell_to_dense(ops_r.system), S_expect,
                                   atol=1e-12)


@pytest.mark.parametrize("order", [1, 2])
def test_time_stepping_with_reaction_matches_scipy_oracle(order):
    """Scan solve with reaction vs an explicit scipy spsolve oracle doing
    the per-step algebra on (M + c*dt*(K+A+rM)) (test_fem.py oracle
    extended by the reaction fold)."""
    domain = Domain(Lx=2.0, Ly=2.0, T=0.5)
    md = MeshData(create_mesh(6, 2.0), domain, nt=4, dtype=jnp.float64)
    problem = Problem(v=(1.0, 0.5), D=0.1, reaction=R)
    solver = CRBESolver(domain, problem, md, time_scheme_order=order,
                        solver_tol=1e-13, solver_maxiter=500)
    sols = np.asarray(solver.solve())

    ops = solver._ops
    n = md.number_of_segments
    vals, cols = np.asarray(ops.system.vals), np.asarray(ops.system.cols)
    rows = np.repeat(np.arange(n), vals.shape[1])
    S = sps.csr_matrix((vals.ravel(), (rows, cols.ravel())), shape=(n, n))
    kv, kc = np.asarray(ops.ka.vals), np.asarray(ops.ka.cols)
    KA = sps.csr_matrix((kv.ravel(), (rows[: kv.size], kc.ravel())),
                        shape=(n, n))
    M_d = np.asarray(ops.mass_diag)
    bmask = np.asarray(md.boundary_mask)
    mid = np.asarray(md.midpoints)
    dt = solver.dt

    u = np.asarray(problem.initial_condition_fn(md.midpoints))
    expect = [u]
    for step in range(1, md.nt):
        t = step * dt
        b = M_d * u if order == 1 else M_d * u - 0.5 * dt * (KA @ u)
        b[bmask] = 0.0
        u = spla.spsolve(S.tocsc(), b)
        lift = np.zeros(n)
        xyt = np.hstack([mid, np.full((n, 1), t)])
        bc = np.asarray(problem.boundary_fn(jnp.asarray(xyt)))
        lift[bmask] = bc[bmask]
        expect.append(u + lift)
    np.testing.assert_allclose(sols, np.asarray(expect), atol=1e-9)


def test_fem_converges_to_decayed_oracle():
    """The solved decayed plume converges to the exp(-r t)-scaled exact
    solution under refinement (rel-L2 vs the decayed analytical oracle
    decreases with h)."""
    domain = Domain()
    problem = Problem(reaction=R)
    errs = []
    for ms in (8, 16):
        md = MeshData(create_mesh(ms, 20.0), domain, nt=64,
                      dtype=jnp.float64)
        s = CRBESolver(domain, problem, md, solver_tol=1e-11)
        s.solve()
        errs.append(s.compute_errors(problem.analytical_solution)[0])
    assert errs[1] < errs[0], errs


@pytest.mark.parametrize("order", [1, 2])
def test_pure_decay_is_exact_scalar_recursion(order):
    """With v=0, D=0 the spatial operator is exactly r*M, so each interior
    DOF follows the scalar recursion u -> u/(1+r dt) (BE) or
    u -> u (1 - r dt/2)/(1 + r dt/2) (CN) — a sharp quantitative oracle
    for the reaction magnitude on every path downstream of assemble."""
    domain = Domain()
    md = MeshData(create_mesh(8, 20.0), domain, nt=9, dtype=jnp.float64)
    problem = Problem(v=(0.0, 0.0), D=0.0, reaction=R)
    s = CRBESolver(domain, problem, md, time_scheme_order=order,
                   solver_tol=1e-14, solver_maxiter=500)
    sols = np.asarray(s.solve())
    dt = s.dt
    factor = (1.0 / (1.0 + R * dt) if order == 1
              else (1.0 - 0.5 * R * dt) / (1.0 + 0.5 * R * dt))
    interior = ~np.asarray(md.boundary_mask)
    u0 = np.asarray(problem.initial_condition_fn(md.midpoints))
    for step in range(md.nt):
        np.testing.assert_allclose(sols[step][interior],
                                   (factor**step) * u0[interior],
                                   rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("impl", ["stencil", "uniform"])
@pytest.mark.parametrize("order", [1, 2])
def test_structured_paths_match_ell_with_reaction(impl, order):
    """The gather-free stencil and 15-scalar uniform operators inherit the
    reaction fold (they extract from the assembled ka/system), matching
    the ELL scan path exactly."""
    domain, problem = Domain(), Problem(reaction=R)
    md = MeshData(create_mesh(9, 20.0), domain, nt=6, dtype=jnp.float64)
    kw = dict(time_scheme_order=order, solver_tol=1e-12, solver_maxiter=400)
    ref = np.asarray(
        CRBESolver(domain, problem, md, matvec_impl="ell", **kw).solve())
    got = np.asarray(
        CRBESolver(domain, problem, md, matvec_impl=impl, **kw).solve())
    np.testing.assert_allclose(got, ref, atol=1e-10)


@pytest.mark.kernels
@pytest.mark.parametrize("order", [1, 2])
def test_fused_kernel_matches_scan_with_reaction(order):
    """The fused VMEM Pallas solver consumes the system/ka canvases built
    from the folded operator — reaction flows through with no kernel
    changes (BE and the reconstructed Crank-Nicolson RHS)."""
    domain, problem = Domain(), Problem(reaction=R)
    md = MeshData(create_mesh(9, 20.0), domain, nt=6, dtype=jnp.float64)
    kw = dict(time_scheme_order=order, solver_maxiter=400)
    ref = np.asarray(CRBESolver(domain, problem, md, matvec_impl="ell",
                                solver_tol=1e-12, **kw).solve())
    got = np.asarray(CRBESolver(domain, problem, md, matvec_impl="fused",
                                fused_iters=30, **kw)
                     .solve(store_solutions=False))
    np.testing.assert_allclose(got[0], ref[-1], atol=1e-8)


def test_pinn_residual_vanishes_on_exact_decayed_solution():
    """pde_residual(reaction=r) is ~0 on the exact decayed plume and
    clearly nonzero when the reaction term is dropped — an analytic
    oracle for the + r c term (ops/autodiff.pde_residual)."""
    problem = Problem(reaction=R)

    def u_exact(xyt):
        return problem.analytical_solution(xyt.reshape(1, 3)).reshape(())

    pts = jnp.asarray(
        [[0.4, -0.3, 0.5], [1.2, 0.8, 1.0], [-0.5, 0.1, 0.25]],
        dtype=jnp.float64,
    )
    source = jnp.zeros((pts.shape[0],), jnp.float64)
    res = autodiff.pde_residual(u_exact, pts, problem.v, problem.D, source,
                                reaction=R)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-8)
    res_missing = autodiff.pde_residual(u_exact, pts, problem.v, problem.D,
                                        source)
    assert float(jnp.max(jnp.abs(res_missing))) > 1e-3


def test_reaction_is_a_traced_pytree_leaf_with_correct_gradient():
    """reaction is a pytree leaf: jax.grad of the differentiable solve wrt
    r matches central finite differences (unlocks fitting decay rates
    with the inverse engine, diagnostics/inverse.py)."""
    from airpollution_tpu.diagnostics.inverse import solve_final_state

    domain = Domain()
    md = MeshData(create_mesh(6, 20.0), domain, nt=5, dtype=jnp.float64)

    def loss(r):
        u = solve_final_state(Problem(reaction=r), md, tol=1e-13,
                              maxiter=400)
        return jnp.sum(u**2)

    g = float(jax.grad(loss)(jnp.asarray(R, jnp.float64)))
    eps = 1e-5
    fd = (float(loss(jnp.asarray(R + eps, jnp.float64)))
          - float(loss(jnp.asarray(R - eps, jnp.float64)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_square_pulse_accepts_reaction():
    """SquarePulseProblem carries the rate too; r=0 stays bit-identical
    to the no-argument construction (static-zero parity path)."""
    domain = Domain(Lx=20.0, Ly=20.0, T=1.0)
    md = MeshData(create_mesh(8, 20.0), domain, nt=4, dtype=jnp.float64)
    a = np.asarray(CRBESolver(domain, SquarePulseProblem(), md,
                              solver_tol=1e-12).solve())
    b = np.asarray(CRBESolver(domain, SquarePulseProblem(reaction=0.0), md,
                              solver_tol=1e-12).solve())
    np.testing.assert_array_equal(a, b)
    # Nonzero rate: total mass decays strictly faster than pure transport.
    c = np.asarray(CRBESolver(domain, SquarePulseProblem(reaction=2.0), md,
                              solver_tol=1e-12).solve())
    assert float(np.abs(c[-1]).sum()) < float(np.abs(a[-1]).sum())
