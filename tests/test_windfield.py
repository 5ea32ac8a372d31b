"""Spatially varying wind/diffusion fields (variable_coefficients).

Beyond the reference's constant-transport family (utils/common.py:15-30):
problems may override ``velocity_at`` / ``diffusion_at``; the FEM
assembly samples the fields at triangle centroids (models/crbe.assemble)
and the PINN residual per collocation point
(ops/autodiff.problem_pde_residual). ``RotatingPlumeProblem`` is the
exact-solution oracle (rigid rotation commutes with the Laplacian); a
manufactured solution validates the variable-D weak form.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver, local_matrices
from airpollution_tpu.ops import autodiff
from airpollution_tpu.problems import (
    AdDifProblem,
    Domain,
    Problem,
    RotatingPlumeProblem,
)


def _f64(x):
    return jnp.asarray(x, dtype=jnp.float64)


def test_default_hooks_broadcast_constants():
    p = Problem(v=(1.0, 0.5), D=0.1)
    xy = _f64([[0.0, 0.0], [3.0, -2.0]])
    np.testing.assert_array_equal(np.asarray(p.velocity_at(xy)),
                                  [[1.0, 0.5], [1.0, 0.5]])
    np.testing.assert_array_equal(np.asarray(p.diffusion_at(xy)),
                                  [0.1, 0.1])
    np.testing.assert_array_equal(np.asarray(p.diffusion_grad_at(xy)),
                                  np.zeros((2, 2)))


def test_local_matrices_per_triangle_fields_match_constant_calls():
    """Per-triangle (n_tri,) D and (n_tri, 2) v arrays produce exactly the
    matrices of separate constant-coefficient calls (the in_axes split in
    models/crbe.local_matrices)."""
    verts = _f64([
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
        [[1.0, 0.0], [2.0, 0.5], [1.0, 1.5]],
        [[-1.0, 2.0], [0.5, 2.0], [0.0, 3.0]],
    ])
    areas = _f64([0.5, 0.75, 0.75])
    D_arr = _f64([0.1, 0.3, 0.05])
    v_arr = _f64([[1.0, 0.0], [-0.5, 2.0], [0.2, 0.7]])
    loc = local_matrices(verts, areas, D_arr, v_arr)
    for t in range(3):
        one = local_matrices(verts[t:t + 1], areas[t:t + 1],
                             float(D_arr[t]), v_arr[t])
        np.testing.assert_allclose(np.asarray(loc.stiffness[t]),
                                   np.asarray(one.stiffness[0]), atol=1e-14)
        np.testing.assert_allclose(np.asarray(loc.advection[t]),
                                   np.asarray(one.advection[0]), atol=1e-14)
        np.testing.assert_allclose(np.asarray(loc.mass_diag[t]),
                                   np.asarray(one.mass_diag[0]), atol=1e-14)


def test_rotating_exact_solution_satisfies_pde():
    """The closed form really solves the variable-wind PDE: the residual
    through problem_pde_residual (the exact code path the PINN trains
    against) vanishes to machine precision."""
    p = RotatingPlumeProblem(omega=0.17, D=0.08, sigma=1.2, x0=4.0, y0=1.0)

    def u_exact(xyt):
        return p.analytical_solution(xyt.reshape(1, 3)).reshape(())

    pts = _f64([[4.0, 1.0, 2.0], [-2.0, 5.0, 7.0], [5.5, -0.5, 0.3],
                [0.0, 0.0, 5.0]])
    res = autodiff.problem_pde_residual(u_exact, pts, p,
                                        jnp.zeros(pts.shape[0]))
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-12)
    # Dropping the rotation (constant v=0 with the same D) must NOT
    # satisfy the PDE — guards against a trivially-zero residual.
    res_wrong = autodiff.pde_residual(u_exact, pts, jnp.zeros(2), p.D,
                                      jnp.zeros(pts.shape[0]))
    assert float(jnp.max(jnp.abs(res_wrong))) > 1e-4


def test_fem_converges_to_rotating_oracle():
    """CRBE solve of the rotating plume converges to the closed form
    under refinement (the centroid-sampled variable wind is first-order
    consistent)."""
    domain = Domain()
    p = RotatingPlumeProblem()
    errs = []
    for ms in (8, 16, 32):
        md = MeshData(create_mesh(ms, 20.0), domain, nt=64,
                      dtype=jnp.float64)
        s = CRBESolver(domain, p, md, solver_tol=1e-11)
        s.solve()
        errs.append(s.compute_errors(p.analytical_solution)[0])
    assert errs[1] < errs[0] and errs[2] < errs[1], errs
    assert errs[2] < 0.5, errs


@pytest.mark.parametrize("order", [1, 2])
def test_stencil_matches_ell_with_variable_wind(order):
    """The gather-free stencil path carries per-DOF coefficient canvases,
    so it is exact for variable winds — must equal the ELL scan path."""
    domain, p = Domain(), RotatingPlumeProblem()
    md = MeshData(create_mesh(9, 20.0), domain, nt=6, dtype=jnp.float64)
    kw = dict(time_scheme_order=order, solver_tol=1e-12, solver_maxiter=400)
    ref = np.asarray(CRBESolver(domain, p, md, matvec_impl="ell",
                                **kw).solve())
    got = np.asarray(CRBESolver(domain, p, md, matvec_impl="stencil",
                                **kw).solve())
    np.testing.assert_allclose(got, ref, atol=1e-10)


@pytest.mark.kernels
def test_fused_canvas_kernel_matches_scan_with_variable_wind():
    """matvec_impl='fused' auto-degrades to the canvas operator for
    variable-coefficient problems and must reproduce the ELL scan."""
    domain, p = Domain(), RotatingPlumeProblem()
    md = MeshData(create_mesh(9, 20.0), domain, nt=6, dtype=jnp.float64)
    ref = np.asarray(CRBESolver(domain, p, md, matvec_impl="ell",
                                solver_tol=1e-12,
                                solver_maxiter=400).solve())
    got = np.asarray(CRBESolver(domain, p, md, matvec_impl="fused",
                                fused_iters=30)
                     .solve(store_solutions=False))
    np.testing.assert_allclose(got[0], ref[-1], atol=1e-8)


def test_uniform_paths_reject_variable_coefficients():
    """Everything built on the translation-invariant uniform operator
    must refuse variable-coefficient problems loudly. matvec_impl=
    'fused_hbm' is allowed (it routes to the per-DOF canvas stripe
    kernel) but only with the reduction-free Chebyshev solver."""
    domain, p = Domain(), RotatingPlumeProblem()
    md = MeshData(create_mesh(8, 20.0), domain, nt=4, dtype=jnp.float64)
    for kw in (dict(matvec_impl="uniform"),
               dict(matvec_impl="fused", fused_operator="uniform"),
               dict(matvec_impl="fused", assembly="patch")):
        with pytest.raises(ValueError, match="varying"):
            CRBESolver(domain, p, md, **kw)

    s = CRBESolver(domain, p, md, matvec_impl="fused_hbm",
                   solver_method="bicgstab")
    with pytest.raises(ValueError, match="chebyshev"):
        s.solve(store_solutions=False, collect_iters=False)

    from airpollution_tpu.ops import uniform as uniform_mod
    with pytest.raises(ValueError, match="constant"):
        uniform_mod.patch_constants(8, 20.0, p, 0.1, 1)


class _VarDiffusionMMS(AdDifProblem):
    """Manufactured solution with genuinely variable D(x, y): the source
    is DEFINED as the PDE residual of the target field (computed by the
    same autodiff the PINN uses), so the FEM solve must converge to the
    target — validating the variable-D weak form
    integral(D grad c . grad phi) end to end."""

    variable_coefficients = True
    zero_source = False

    def __init__(self):
        super().__init__(jnp.asarray([0.6, 0.3]), 0.1)

    def diffusion_at(self, xy):
        xy = jnp.asarray(xy)
        return 0.1 + 0.05 * jnp.sin(0.2 * xy[..., 0]) * jnp.cos(
            0.15 * xy[..., 1]
        )

    def c_exact(self, xyt):
        xyt = jnp.asarray(xyt)
        x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
        return jnp.exp(-0.1 * t) * jnp.exp(-(x**2 + y**2) / 30.0)

    analytical_solution = c_exact

    def initial_condition_fn(self, xy):
        xy = jnp.asarray(xy)
        t0 = jnp.zeros(xy.shape[:-1] + (1,), dtype=xy.dtype)
        return self.c_exact(jnp.concatenate([xy, t0], axis=-1))

    def boundary_fn(self, xyt):
        return self.c_exact(jnp.asarray(xyt))

    def source_term(self, xyt):
        xyt = jnp.asarray(xyt)
        flat = xyt.reshape(-1, 3)

        def u_fn(p):
            return self.c_exact(p.reshape(1, 3)).reshape(())

        s = autodiff.problem_pde_residual(
            u_fn, flat, self, jnp.zeros(flat.shape[0], flat.dtype)
        )
        return s.reshape(xyt.shape[:-1])


def test_variable_diffusion_manufactured_convergence():
    domain = Domain(Lx=20.0, Ly=20.0, T=2.0)
    p = _VarDiffusionMMS()
    errs = []
    for ms in (8, 16):
        md = MeshData(create_mesh(ms, 20.0), domain, nt=32,
                      dtype=jnp.float64)
        s = CRBESolver(domain, p, md, solver_tol=1e-11)
        s.solve()
        errs.append(s.compute_errors(p.analytical_solution)[0])
    assert errs[1] < 0.6 * errs[0], errs


def test_gradient_through_variable_assembly():
    """omega is a traced pytree leaf: jax.grad of the differentiable
    solve wrt the rotation rate matches finite differences (wind-field
    parameters are fittable by the inverse engine)."""
    from airpollution_tpu.diagnostics.inverse import solve_final_state

    domain = Domain()
    md = MeshData(create_mesh(6, 20.0), domain, nt=5, dtype=jnp.float64)

    def loss(om):
        p = RotatingPlumeProblem(omega=om)
        u = solve_final_state(p, md, tol=1e-13, maxiter=400)
        return jnp.sum(u**2)

    om0 = jnp.asarray(0.12, jnp.float64)
    g = float(jax.grad(loss)(om0))
    eps = 1e-5
    fd = (float(loss(om0 + eps)) - float(loss(om0 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_fit_wind_recovers_rotation_rate():
    """inverse.fit_wind moves (omega, D) toward the truth from sparse
    trajectory observations (full-accuracy recovery is the demo script
    scripts/wind_inversion_demo.py; this is the API contract)."""
    from airpollution_tpu.diagnostics import inverse

    domain = Domain()
    md = MeshData(create_mesh(8, 20.0), domain, nt=9, dtype=jnp.float64)
    true = dict(omega=0.15, D=0.08)
    release = dict(sigma=1.5, x0=5.0, y0=0.0)
    idx = [2, 4, 6, 8]
    obs = inverse.solve_snapshots(
        RotatingPlumeProblem(**true, **release), md, indices=idx,
        tol=1e-10, maxiter=200)
    result, losses = inverse.fit_wind(
        obs, md, snapshot_indices=idx, omega0=0.05, D=0.05,
        fit_diffusion=True, steps=30, lr=0.02, tol=1e-10, maxiter=200,
        **release)
    assert losses[-1] < 0.2 * losses[0], losses[::10]
    assert abs(result["omega"] - true["omega"]) < abs(0.05 - true["omega"])


def test_fit_wind_grid_search_escapes_wrong_basin():
    """The rotation misfit is non-convex (cycle-skipping): omega_grid
    must pick the candidate nearest the truth as the start, even when
    the default omega0 sits in the wrong basin."""
    from airpollution_tpu.diagnostics import inverse

    domain = Domain()
    md = MeshData(create_mesh(8, 20.0), domain, nt=9, dtype=jnp.float64)
    true = dict(omega=0.2, D=0.08)
    release = dict(sigma=1.5, x0=5.0, y0=0.0)
    idx = [2, 4, 6, 8]
    obs = inverse.solve_snapshots(
        RotatingPlumeProblem(**true, **release), md, indices=idx,
        tol=1e-10, maxiter=200)
    result, losses = inverse.fit_wind(
        obs, md, snapshot_indices=idx, omega0=0.01,
        omega_grid=[0.01, 0.1, 0.2, 0.3], steps=10, lr=0.01,
        tol=1e-10, maxiter=200, **release)
    # The grid must select the exact-truth candidate (zero misfit there)
    # and the polish must stay in that basin.
    assert result["omega0"] == 0.2, result
    assert abs(result["omega"] - true["omega"]) < 0.02, result


def test_row_sharded_solve_matches_serial_with_variable_wind():
    """The multi-chip row-sharded ELL solver (parallel/fem_shard.py)
    consumes the assembled operator, so spatially varying coefficients
    flow through it unchanged — 8-way sharded solve equals serial."""
    from airpollution_tpu.parallel import (
        build_sharded_solver,
        make_mesh,
        pad_operators,
    )

    domain, p = Domain(), RotatingPlumeProblem()
    md = MeshData(create_mesh(8, 20.0), domain, nt=8, dtype=jnp.float64)
    solver = CRBESolver(domain, p, md, solver_tol=1e-11)
    sols_serial = np.asarray(solver.solve(store_solutions=False))

    mesh = make_mesh({"mp": 8})
    ops, _ = pad_operators(solver._require_ops(), md.number_of_segments, 8)
    sharded = build_sharded_solver(
        mesh, md, p, solver.dt, tol=1e-11, store_solutions=False
    )
    sols_shard = np.asarray(sharded(ops, solver.set_initial_condition()))
    np.testing.assert_allclose(sols_shard, sols_serial, atol=1e-9)


def test_pinn_accepts_variable_wind_problem():
    """PINN.compute_pde_residual runs on a variable-coefficient problem
    and is near zero when the net IS the exact solution (hard check via
    a wrapper net is in test_rotating_exact_solution_satisfies_pde; here
    the end-to-end class surface must at least trace and stay finite)."""
    from airpollution_tpu.models.pinn import PINN

    p = RotatingPlumeProblem()
    model = PINN([3, 8, 8, 1], p, Domain(), dtype=jnp.float64)
    pts = _f64([[4.0, 1.0, 2.0], [-2.0, 5.0, 7.0]])
    res = model.compute_pde_residual(pts)
    assert np.isfinite(np.asarray(res)).all()


def test_variable_wind_on_unstructured_mesh():
    """Centroid sampling is mesh-agnostic: the ELL path converges to the
    rotating-plume closed form on jittered-Delaunay unstructured meshes
    too (the structured-only fast paths are not involved)."""
    from airpollution_tpu.mesh import create_unstructured_mesh

    domain, p = Domain(), RotatingPlumeProblem()
    errs = []
    for ms in (8, 16):
        mesh = create_unstructured_mesh(ms, 20.0, seed=0)
        md = MeshData(mesh, domain, nt=64, dtype=jnp.float64)
        s = CRBESolver(domain, p, md, solver_tol=1e-11,
                       solver_maxiter=800)
        s.solve()
        errs.append(s.compute_errors(p.analytical_solution)[0])
    assert errs[1] < 0.55 * errs[0], errs
