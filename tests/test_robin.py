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


# Subclasses must self-register to be traced arguments of the jitted
# PINN trainer (problems.register_problem_pytree).
from airpollution_tpu.problems import register_problem_pytree  # noqa: E402

register_problem_pytree(_RobinPlume, ("v", "D", "sigma", "reaction"))


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
    with pytest.raises(ValueError, match="per-DOF"):
        CRBESolver(domain, p, md, matvec_impl="uniform")
    with pytest.raises(ValueError, match="canvas"):
        # Fused paths need the per-DOF canvas operator under Robin.
        CRBESolver(domain, p, md, matvec_impl="fused",
                   fused_operator="uniform")
    with pytest.raises(ValueError, match="full assembly"):
        CRBESolver(domain, p, md, assembly="patch")

    class _GProblem(SquarePulseProblem):
        def robin_g(self, xy, t, side):
            return jnp.ones(xy.shape[0], xy.dtype)

    pg = _GProblem()
    pg.robin_sides = {"bottom": 0.1}
    with pytest.raises(ValueError, match="robin_g"):
        # The fused kernels evaluate no g-load (deposition scope).
        CRBESolver(domain, pg, md, matvec_impl="fused")
    # 'auto' keeps its routing (stencil family path on this structured
    # mesh) and the per-DOF paths agree under Robin.
    sols_auto = CRBESolver(domain, p, md, solver_tol=1e-12).solve()
    sols_ell = CRBESolver(domain, p, md, matvec_impl="ell",
                          solver_tol=1e-12).solve()
    np.testing.assert_allclose(np.asarray(sols_auto),
                               np.asarray(sols_ell), atol=1e-10)
    # The PARALLEL PINN trainer is Dirichlet-only.
    from airpollution_tpu.models.pinn import PINN

    model = PINN([3, 8, 1], p, domain)
    with pytest.raises(ValueError, match="serial trainer"):
        import jax

        mesh = jax.make_mesh((len(jax.devices()), 1), ("dp", "tp"))
        model.train_parallel(mesh, {"pde": 8, "ic": 4, "bc": 4}, 1, 1e-3,
                             {"pde": 1.0, "ic": 1.0, "bc": 1.0})


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


def test_pinn_robin_flux_residual_matches_finite_differences():
    """The PINN boundary loss on a Robin side is the flux residual
    D dc/dn + alpha c - g of the NETWORK — validated against a central
    finite-difference normal derivative of the same network."""
    import jax
    from airpollution_tpu.models import pinn as pinn_mod

    domain = Domain(T=2.0)
    p = SquarePulseProblem(v=(0.0, 0.0), D=0.7)
    p.robin_sides = {"right": 0.4}
    model = pinn_mod.PINN([3, 6, 1], p, domain, activation="tanh", seed=3)

    n_bc = 16  # 4 per side, contiguous in order left/right/bottom/top
    rng = np.random.default_rng(0)
    xyt_bc = np.zeros((n_bc, 3))
    xyt_bc[:, 2] = rng.uniform(0, 2, n_bc)
    ys = rng.uniform(-20, 20, n_bc)
    xs = rng.uniform(-20, 20, n_bc)
    xyt_bc[0:4, 0], xyt_bc[0:4, 1] = -20.0, ys[0:4]     # left
    xyt_bc[4:8, 0], xyt_bc[4:8, 1] = 20.0, ys[4:8]      # right (robin)
    xyt_bc[8:12, 0], xyt_bc[8:12, 1] = xs[8:12], -20.0  # bottom
    xyt_bc[12:16, 0], xyt_bc[12:16, 1] = xs[12:16], 20.0  # top
    xyt_bc = jnp.asarray(xyt_bc, jnp.float64)
    params = jax.tree.map(lambda a: a.astype(jnp.float64), model.params)

    bc_target = jnp.asarray(p.boundary_fn(xyt_bc)).reshape(-1, 1)
    xyt_pde = xyt_bc  # unused by the bc term
    ic = xyt_bc[:4]
    ic_t = bc_target[:4]
    lw = {"pde": 0.0, "ic": 0.0, "bc": 3.0}
    _, (_, _, bc_loss) = pinn_mod.composite_loss(
        params, p, xyt_pde, ic, ic_t, xyt_bc, bc_target, lw, None, "tanh")

    def fwd(pts):
        return np.asarray(pinn_mod.mlp_apply(params, jnp.asarray(pts),
                                             "tanh"))[:, 0]

    eps = 1e-6
    res = fwd(xyt_bc) - np.asarray(bc_target)[:, 0]  # dirichlet rows
    pr = np.asarray(xyt_bc[4:8])
    dplus, dminus = pr.copy(), pr.copy()
    dplus[:, 0] += eps
    dminus[:, 0] -= eps
    dcdn = (fwd(dplus) - fwd(dminus)) / (2 * eps)  # outward normal = +x
    res[4:8] = 0.7 * dcdn + 0.4 * fwd(pr)  # g = 0 default
    np.testing.assert_allclose(float(bc_loss), np.mean(res ** 2),
                               rtol=1e-6)


def test_pinn_robin_mms_training_improves():
    """Short PINN training on the manufactured Robin plume: the loss and
    the boundary term both drop, errors stay finite (the full-accuracy
    campaign lives in the FEM MMS test; this pins the trainable path)."""
    from airpollution_tpu.models.pinn import PINN

    domain = Domain()
    p = _RobinPlume(v=(1.6, 0.0), D=0.1)
    model = PINN([3, 12, 12, 1], p, domain, activation="tanh", seed=0)
    batch = {"pde": 256, "ic": 64, "bc": 64}
    hist = model.train(batch, 300, 1e-3,
                       {"pde": 1.0, "ic": 10.0, "bc": 10.0})
    assert hist["total_loss"][-1] < 0.5 * hist["total_loss"][0]
    assert hist["bc_loss"][-1] < hist["bc_loss"][0]
    md = MeshData(create_mesh(8, 20.0), domain, nt=9, dtype=jnp.float64)
    rel, l2, mx = model.compute_errors(md, p.analytical_solution)
    assert np.isfinite([rel, l2, mx]).all()


def test_receptor_footprint_matches_finite_differences():
    """Adjoint source-attribution map vs brute-force perturbation: the
    footprint row F_r must equal (c_eps(x_r, T) - c_0(x_r, T)) / eps for
    a steady unit-source bump at any emitter DOF (the PDE is linear in
    s, so the 'finite' difference is exact up to solver tolerance)."""
    from airpollution_tpu.diagnostics import inverse, receptor_footprint
    from airpollution_tpu.models.crbe import run_time_loop

    domain = Domain(T=2.0)
    md = MeshData(create_mesh(8, 20.0), domain, nt=9, dtype=jnp.float64)
    p = Problem(v=(1.0, 0.5), D=0.2)
    receptors = [int(md.number_of_segments // 2), 7]
    F = np.asarray(receptor_footprint(md, domain, p, receptors))
    assert F.shape == (2, md.number_of_segments)
    assert np.isfinite(F).all() and np.abs(F).max() > 0

    # Brute force at a few emitter DOFs via the sourced linear solve.
    import jax

    dt = float(domain.T) / (md.nt - 1)
    from airpollution_tpu.models.crbe import assemble

    ops = assemble(md, p, dt, 1, "correct")
    n = md.number_of_segments
    rng = np.random.default_rng(1)
    probe = rng.choice(n, 4, replace=False)

    def reading(s_vec):
        class _P:
            zero_source = False

            @staticmethod
            def source_term(xyt):
                return s_vec

            @staticmethod
            def boundary_fn(xyt):
                return jnp.zeros(xyt.shape[0], xyt.dtype)

        sols, _ = run_time_loop(
            ops, jnp.zeros((n,), jnp.float64), mesh_data=md, problem=_P,
            dt=dt, order=1, tol=1e-12, maxiter=400,
            store_solutions=False)
        return np.asarray(sols[0])[receptors]

    base = reading(jnp.zeros((n,), jnp.float64))
    for j in probe:
        e = jnp.zeros((n,), jnp.float64).at[int(j)].set(1.0)
        delta = reading(e) - base
        # Both sides are Krylov solves (adjoint tol 1e-9, probe tol
        # 1e-12) — agreement to solver tolerance, not bitwise.
        np.testing.assert_allclose(F[:, int(j)], delta, rtol=1e-4,
                                   atol=1e-12)


def test_receptor_footprint_extends_upwind():
    """Physics of the adjoint map: with wind v=(1, 0) a receptor is
    influenced by UPWIND emitters — the footprint mass at x < x_r must
    dominate the mass at x > x_r."""
    from airpollution_tpu.diagnostics import receptor_footprint

    domain = Domain(T=4.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=17, dtype=jnp.float64)
    mid = np.asarray(md.midpoints)
    # Receptor near the domain center.
    r = int(np.argmin(np.abs(mid[:, 0]) + np.abs(mid[:, 1])))
    p = Problem(v=(1.0, 0.0), D=0.3)
    F = np.asarray(receptor_footprint(md, domain, p, [r]))[0]
    x_r = mid[r, 0]
    upwind = F[mid[:, 0] < x_r - 1.0].sum()
    downwind = F[mid[:, 0] > x_r + 1.0].sum()
    assert upwind > 5.0 * max(downwind, 0.0), (upwind, downwind)

# --- Robin on the fused canvas kernels -------------------------------------
# The per-DOF canvas coefficients carry the assembled alpha * |e| wall
# diagonal, so the fused paths need only the REDUCED Dirichlet mask:
# the VMEM canvas kernel takes it as interior-mask input canvases, the
# HBM canvas stripe kernel as widened interior-rectangle bounds
# (ops/pallas_hbm.robin_rect_bounds). Oracles: the scan paths, whose
# Robin handling is MMS-validated above.


@pytest.mark.kernels
@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("robin", [
    {"bottom": 0.1, "left": 0.05},              # mixed Robin/Dirichlet
    {"bottom": 0.1, "top": 0.2, "left": 0.05, "right": 0.15},  # no Dirichlet
])
def test_robin_fused_vmem_matches_scan(order, robin):
    """VMEM canvas kernel (BiCGStab, fixed iterations) == stencil scan at
    the same iteration count, under Robin walls (f64: same algorithm,
    different layout/reduction order)."""
    domain = Domain(T=1.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=7, dtype=jnp.float64)
    p = SquarePulseProblem()
    p.robin_sides = dict(robin)
    ref = CRBESolver(domain, p, md, matvec_impl="stencil",
                     time_scheme_order=order,
                     solver_tol=1e-30, solver_maxiter=5)
    u_ref = np.asarray(ref.solve(store_solutions=False))
    fused = CRBESolver(domain, p, md, matvec_impl="fused",
                       time_scheme_order=order, fused_iters=5)
    assert fused.fused_operator != "uniform"
    u_fused = np.asarray(fused.solve(store_solutions=False))
    np.testing.assert_allclose(u_fused, u_ref, atol=1e-10)
    # Deposition sanity: the walls removed mass vs the all-Dirichlet-free
    # closed box (v=0 problems conserve; here just require finiteness and
    # nonzero state).
    assert np.all(np.isfinite(u_fused)) and np.abs(u_fused).max() > 0


@pytest.mark.kernels
@pytest.mark.parametrize("order,extrapolate", [(1, False), (2, True)])
def test_robin_fused_hbm_matches_ell_truth(order, extrapolate):
    """HBM canvas stripe kernel (Chebyshev, widened rect bounds) converges
    to the same implicit trajectory as the tight-tolerance ELL scan under
    Robin walls. ms=33 so stripes clamp at both canvas edges (the
    widened H-row/V-column bounds are exercised at every wall)."""
    domain = Domain(T=1.0)
    md = MeshData(create_mesh(33, 20.0), domain, nt=5, dtype=jnp.float64)
    p = SquarePulseProblem()
    p.robin_sides = {"bottom": 0.3, "top": 0.1, "right": 0.2}
    truth = CRBESolver(domain, p, md, matvec_impl="ell",
                       time_scheme_order=order, solver_tol=1e-13,
                       solver_maxiter=400)
    u_ref = np.asarray(truth.solve(store_solutions=False))
    fused = CRBESolver(domain, p, md, matvec_impl="fused_hbm",
                       solver_method="chebyshev", chebyshev_iters=30,
                       time_scheme_order=order,
                       extrapolate_warm_start=extrapolate)
    u_fused = np.asarray(fused.solve(store_solutions=False))
    np.testing.assert_allclose(u_fused, u_ref, atol=5e-9)


@pytest.mark.kernels
def test_robin_fused_strided_snapshots_match_scan():
    """Strided fused trajectories under Robin: every snapshot row (lift on
    the REDUCED Dirichlet set only) matches the scan path's rows."""
    domain = Domain(T=1.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=7, dtype=jnp.float64)
    p = SquarePulseProblem()
    p.robin_sides = {"bottom": 0.2, "left": 0.1}
    ref = CRBESolver(domain, p, md, matvec_impl="stencil",
                     solver_tol=1e-30, solver_maxiter=6)
    sols_ref = np.asarray(ref.solve())[::3]
    fused = CRBESolver(domain, p, md, matvec_impl="fused",
                       fused_iters=6, snapshot_every=3)
    sols_fused = np.asarray(fused.solve(store_solutions=True))
    assert sols_fused.shape == sols_ref.shape
    np.testing.assert_allclose(sols_fused, sols_ref, atol=1e-10)


# --- Inhomogeneous Robin flux data (g != 0) on the fused canvas paths ------
# The flux law -D dc/dn = alpha c - g with nonzero g: the scan paths
# evaluate problem.robin_g (MMS-validated above); the HBM canvas stripe
# kernel evaluates the elementwise problem.robin_g_xy on wall coordinate
# lines rebuilt from iotas (ops/pallas_hbm._canvas_step_kernel), with the
# default robin_g DELEGATING to robin_g_xy so both paths share one law.


class _GFluxPulse(SquarePulseProblem):
    """Square pulse with inhomogeneous flux walls: deposition + a
    time-dependent inflow g on the bottom, a pure Neumann flux inflow on
    the left (alpha = 0), and a deposition-only top (g = 0 there)."""

    robin_sides = {"bottom": 0.3, "left": 0.0, "top": 0.1}

    def robin_g_xy(self, x, y, t, side):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        if side == "bottom":
            return (0.5 * (1.0 + jnp.sin(0.2 * x)) * (1.0 + 0.3 * t)
                    + 0.0 * y)
        if side == "left":
            return 0.25 * jnp.exp(-(((y - 5.0) / 8.0) ** 2)) + 0.0 * x
        return jnp.zeros_like(x + y)


def test_robin_g_delegation_and_gates():
    """Default robin_g delegates to robin_g_xy (one law for scan, PINN
    and fused); g-customized problems are gated off the paths that
    cannot evaluate the load."""
    p = _GFluxPulse()
    xy = jnp.asarray([[1.0, -20.0], [3.0, -20.0]])
    np.testing.assert_allclose(
        np.asarray(p.robin_g(xy, 0.5, "bottom")),
        np.asarray(p.robin_g_xy(xy[:, 0], xy[:, 1], 0.5, "bottom")),
    )
    from airpollution_tpu.problems import robin_g_customized

    assert robin_g_customized(p)
    assert not robin_g_customized(SquarePulseProblem())

    domain = Domain(T=1.0)
    md = MeshData(create_mesh(6, 20.0), domain, nt=5, dtype=jnp.float64)
    # The VMEM canvas kernel (BiCGStab) evaluates no loads.
    with pytest.raises(ValueError, match="chebyshev"):
        CRBESolver(domain, p, md, matvec_impl="fused")
    # robin_g overridden WITHOUT an elementwise robin_g_xy: fused paths
    # cannot rebuild the load and refuse.
    class _VectorOnly(SquarePulseProblem):
        robin_sides = {"bottom": 0.1}

        def robin_g(self, xy, t, side):
            return jnp.ones(xy.shape[0], xy.dtype)

    with pytest.raises(ValueError, match="robin_g_xy"):
        CRBESolver(domain, _VectorOnly(), md, matvec_impl="fused_hbm",
                   solver_method="chebyshev")
    # The distributed canvas stripe solver needs the elementwise hook
    # too (vector-only robin_g cannot be rebuilt from iotas).
    import jax

    from airpollution_tpu.parallel.hbm_shard import (
        build_canvas_hbm_halo_solver,
    )

    dev_mesh = jax.make_mesh((1,), ("mp",))
    with pytest.raises(ValueError, match="robin_g_xy"):
        build_canvas_hbm_halo_solver(dev_mesh, md, _VectorOnly(), 0.25)


@pytest.mark.kernels
@pytest.mark.parametrize("order,extrapolate", [(1, False), (2, True)])
def test_robin_g_fused_hbm_matches_ell_truth(order, extrapolate):
    """HBM canvas stripe kernel with the in-kernel g-load converges to
    the tight-tolerance ELL scan trajectory (BE samples t^{n+1}, CN the
    trapezoid — run_time_loop's robin_load semantics). ms=33 so stripes
    clamp at both canvas edges."""
    domain = Domain(T=1.0)
    md = MeshData(create_mesh(33, 20.0), domain, nt=5, dtype=jnp.float64)
    p = _GFluxPulse()
    truth = CRBESolver(domain, p, md, matvec_impl="ell",
                       time_scheme_order=order, solver_tol=1e-13,
                       solver_maxiter=400)
    u_ref = np.asarray(truth.solve(store_solutions=False))
    fused = CRBESolver(domain, p, md, matvec_impl="fused_hbm",
                       solver_method="chebyshev", chebyshev_iters=30,
                       time_scheme_order=order,
                       extrapolate_warm_start=extrapolate)
    u_fused = np.asarray(fused.solve(store_solutions=False))
    np.testing.assert_allclose(u_fused, u_ref, atol=5e-9)
    # The g-load genuinely matters: a pure-deposition run (same alphas,
    # g = 0) must differ by far more than the comparison tolerance.
    p0 = SquarePulseProblem()
    p0.robin_sides = dict(_GFluxPulse.robin_sides)
    u0 = np.asarray(CRBESolver(
        domain, p0, md, matvec_impl="ell", time_scheme_order=order,
        solver_tol=1e-13, solver_maxiter=400,
    ).solve(store_solutions=False))
    assert np.abs(u_fused - u0).max() > 1e-3


@pytest.mark.kernels
def test_robin_g_fused_strided_snapshots_match_scan():
    """Strided fused trajectories with the g-load: each chunked kernel
    sweep passes its own t0, so the time-dependent bottom inflow must
    line up with the scan rows chunk by chunk."""
    domain = Domain(T=1.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=7, dtype=jnp.float64)
    p = _GFluxPulse()
    ref = CRBESolver(domain, p, md, matvec_impl="ell",
                     time_scheme_order=2, solver_tol=1e-13,
                     solver_maxiter=400)
    sols_ref = np.asarray(ref.solve())[::3]
    fused = CRBESolver(domain, p, md, matvec_impl="fused_hbm",
                       solver_method="chebyshev", chebyshev_iters=30,
                       time_scheme_order=2, snapshot_every=3)
    sols_fused = np.asarray(fused.solve(store_solutions=True))
    assert sols_fused.shape == sols_ref.shape
    np.testing.assert_allclose(sols_fused, sols_ref, atol=5e-9)


def test_robin_g_instance_assignment_is_gated():
    """g assigned as an INSTANCE attribute (the exact_robin_g MMS
    shortcut, `p.robin_g = partial(exact_robin_g, p)`) must hit the same
    g = 0 gates as subclass overrides — a miss would make the fused
    paths silently solve different physics than the scan paths (review
    finding, round 2)."""
    from functools import partial

    from airpollution_tpu.problems import (robin_g_customized,
                                           robin_g_xy_provided)

    domain = Domain(T=1.0)
    md = MeshData(create_mesh(6, 20.0), domain, nt=5, dtype=jnp.float64)
    p = Problem(v=(1.6, 0.0), D=0.1)
    p.robin_sides = {"right": 0.7}
    p.robin_g = partial(exact_robin_g, p)
    assert robin_g_customized(p) and not robin_g_xy_provided(p)
    with pytest.raises(ValueError, match="robin_g_xy"):
        CRBESolver(domain, p, md, matvec_impl="fused_hbm",
                   solver_method="chebyshev")
    # Instance-assigned robin_g_xy counts as the elementwise hook.
    p2 = _GFluxPulse()
    base = _GFluxPulse.robin_g_xy
    p2.robin_g_xy = lambda x, y, t, side: 2.0 * base(p2, x, y, t, side)
    assert robin_g_xy_provided(p2)


def test_fit_surface_exchange_recovers_vd_and_ccomp():
    """Joint bidirectional-exchange estimation: recover per-side
    (v_d, c_comp) of the flux law -D dc/dn = v_d (c - c_comp) from a
    1%-noisy trajectory — v_d flows through the assembled diagonal
    (robin_alpha) and g = v_d c_comp through the RHS load
    (robin_g_const), both in one discrete adjoint."""
    from airpollution_tpu.diagnostics import inverse

    domain = Domain(T=2.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=17, dtype=jnp.float64)
    truth_a = {"right": 0.6, "top": 0.15}
    truth_c = {"right": 0.05, "top": 0.2}
    p = SquarePulseProblem(v=(0.0, 0.0), D=1.0, lo=10.0, hi=20.0)
    p.robin_sides = dict(truth_a)
    idx = [4, 8, 12, 16]
    g_true = {s: truth_a[s] * truth_c[s] for s in truth_a}
    obs = inverse.solve_snapshots(p, md, indices=idx,
                                  robin_g_const=g_true)
    rng = np.random.default_rng(0)
    obs = obs * (1.0 + 0.01 * rng.standard_normal(obs.shape))

    out, losses = inverse.fit_surface_exchange(
        obs, md, p, alpha0=0.25, c_comp0=0.0, snapshot_indices=idx,
        steps=400, lr=0.05)
    assert losses[-1] < 0.1 * losses[0]
    for s, a_true in truth_a.items():
        v, c = out[s]
        assert abs(v - a_true) / a_true < 0.05, (s, out)
        assert abs(c - truth_c[s]) / truth_c[s] < 0.05, (s, out)
