"""Tests for the fully fused Pallas solve kernel (interpreter on CPU)."""

import pytest as _pytest

pytestmark = _pytest.mark.kernels


import numpy as np
import pytest

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import Domain, Problem, SquarePulseProblem


@pytest.mark.parametrize("fused_operator", ["canvas", "uniform"])
@pytest.mark.parametrize("problem_cls", [Problem, SquarePulseProblem])
@pytest.mark.parametrize("order", [1, 2])
def test_fused_matches_stencil_final_state(problem_cls, order,
                                           fused_operator):
    domain = Domain()
    problem = problem_cls()
    md = MeshData(create_mesh(10, 20.0), domain, nt=12)
    ref = CRBESolver(domain, problem, md, matvec_impl="stencil",
                     time_scheme_order=order,
                     solver_tol=1e-12, solver_maxiter=5)
    u_ref = np.asarray(ref.solve(store_solutions=False))
    fused = CRBESolver(domain, problem, md, matvec_impl="fused",
                       time_scheme_order=order, fused_iters=5,
                       fused_operator=fused_operator)
    u_fused = np.asarray(fused.solve(store_solutions=False))
    # Same algorithm, same iteration count -> tight agreement in f32.
    np.testing.assert_allclose(u_fused, u_ref, atol=2e-5)


def test_fused_scope_guards():
    domain = Domain()
    md = MeshData(create_mesh(6, 20.0), domain, nt=4)
    s = CRBESolver(domain, Problem(), md, matvec_impl="fused")
    with pytest.raises(ValueError):
        s.solve(store_solutions=True)

    class SourcedProblem(Problem):
        zero_source = False

    # Sourced problems are supported on the uniform fused operator (the
    # load is evaluated in-kernel from iota coordinates) but NOT on the
    # canvas operator.
    s = CRBESolver(domain, SourcedProblem(), md, matvec_impl="fused",
                   fused_operator="canvas")
    with pytest.raises(ValueError):
        s.solve(store_solutions=False)


def test_fused_cn_fits_same_meshes_as_be():
    """The CN RHS operator is reconstructed from the system canvases
    in-kernel (ops/pallas_solver.py identity), so CN's VMEM budget equals
    BE's: 256^2 (formerly rejected for CN at 63 canvases) must now pass
    the fits check, order-independently."""
    from airpollution_tpu.models.crbe import _pallas_fused_fits
    from airpollution_tpu.ops.stencil import build_stencil_pattern

    domain = Domain()
    md = MeshData(create_mesh(256, 20.0), domain, nt=4)
    pattern = build_stencil_pattern(
        md._host_t2s, md._host_ell_cols, md.structured_n
    )
    # 48 canvases x 256^2 x 4 B = 12 MB < 14 MB guard.
    assert _pallas_fused_fits(pattern, uniform=False)


def test_uniform_fused_fits_larger_meshes():
    """The uniform operator needs 21 canvases (24 extrapolated) instead of
    48: 380^2 fits, 276^2 in canvas mode does not reach 380^2."""
    from airpollution_tpu.models.crbe import _pallas_fused_fits
    from airpollution_tpu.ops.stencil import build_stencil_pattern

    domain = Domain()
    md = MeshData(create_mesh(380, 20.0), domain, nt=4)
    pattern = build_stencil_pattern(
        md._host_t2s, md._host_ell_cols, md.structured_n
    )
    assert _pallas_fused_fits(pattern, uniform=True)
    assert _pallas_fused_fits(pattern, extrapolate=True, uniform=True)
    assert not _pallas_fused_fits(pattern, uniform=False)


def test_fused_cn_with_nonzero_boundary_ic():
    """CN's first-step RHS includes (K+A) u0 with u0's BOUNDARY columns;
    a wide Gaussian (sigma=15) makes those values significant. The fused
    path must match the general path."""
    domain = Domain()
    problem = Problem(sigma=15.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=8)
    ref = CRBESolver(domain, problem, md, matvec_impl="stencil",
                     time_scheme_order=2, solver_tol=1e-12,
                     solver_maxiter=6)
    u_ref = np.asarray(ref.solve(store_solutions=False))
    for op in ("canvas", "uniform"):
        fused = CRBESolver(domain, problem, md, matvec_impl="fused",
                           time_scheme_order=2, fused_iters=6,
                           fused_operator=op)
        u_fused = np.asarray(fused.solve(store_solutions=False))
        np.testing.assert_allclose(u_fused, u_ref, atol=3e-5)


@pytest.mark.parametrize("order", [1, 2])
def test_fused_extrapolated_warm_start_matches_scan(order):
    """The extrapolated warm start changes only the Krylov initial guess;
    with enough iterations the fused result still matches the converged
    scan path."""
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(10, 20.0), domain, nt=12)
    ref = CRBESolver(domain, problem, md, matvec_impl="stencil",
                     time_scheme_order=order,
                     solver_tol=1e-12, solver_maxiter=8)
    u_ref = np.asarray(ref.solve(store_solutions=False))
    for op in ("canvas", "uniform"):
        fused = CRBESolver(domain, problem, md, matvec_impl="fused",
                           time_scheme_order=order, fused_iters=5,
                           fused_operator=op,
                           extrapolate_warm_start=True)
        u_fused = np.asarray(fused.solve(store_solutions=False))
        np.testing.assert_allclose(u_fused, u_ref, atol=2e-5)


def test_scan_extrapolated_warm_start_matches_plain():
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(12, 20.0), domain, nt=16)
    a = CRBESolver(domain, problem, md, solver_tol=1e-10, solver_maxiter=50)
    b = CRBESolver(domain, problem, md, solver_tol=1e-10, solver_maxiter=50,
                   extrapolate_warm_start=True)
    ua = np.asarray(a.solve(store_solutions=False))
    ub = np.asarray(b.solve(store_solutions=False))
    np.testing.assert_allclose(ua, ub, atol=1e-6)


# --- Sourced fused solves: the load is evaluated IN-KERNEL on iota-
# derived coordinate canvases (zero extra HBM traffic). Oracle: the
# general scan path (run_time_loop via matvec_impl="uniform"), which the
# scipy step oracle in tests/test_fem.py pins independently. ---


def test_family_midpoints_affine_in_canvas_indices():
    """The in-kernel coordinate reconstruction contract: family-layout
    midpoints are affine in canvas (row, col) with row <-> y, col <-> x
    and half-offsets H (+1/2, 0), V (0, +1/2), D (+1/2, +1/2) grid
    units (ops/pallas_solver._uniform_solver_kernel)."""
    from airpollution_tpu.ops import stencil as stencil_mod

    for ms in (5, 9):
        md = MeshData(create_mesh(ms, 20.0), Domain(), nt=3)
        pattern = stencil_mod.get_pattern(md)
        mid = np.asarray(md.midpoints)[pattern.perm]
        c = ms - 1
        pts = np.asarray(md.points)
        xmin, ymin = pts[:, 0].min(), pts[:, 1].min()
        h = (pts[:, 0].max() - xmin) / c
        nH = ms * c
        nV = c * ms
        shapes = {"H": (ms, c), "V": (c, ms), "D": (c, c)}
        offs = {"H": (0.5, 0.0), "V": (0.0, 0.5), "D": (0.5, 0.5)}
        views = {"H": mid[:nH], "V": mid[nH:nH + nV], "D": mid[nH + nV:]}
        for fam, (nr, nc) in shapes.items():
            G = views[fam].reshape(nr, nc, 2)
            ox, oy = offs[fam]
            col = np.arange(nc)[None, :]
            row = np.arange(nr)[:, None]
            np.testing.assert_allclose(
                G[..., 0], xmin + (col + ox) * h + 0 * row, atol=1e-5
            )
            np.testing.assert_allclose(
                G[..., 1], ymin + (row + oy) * h + 0 * col, atol=1e-5
            )


@pytest.mark.parametrize("method", ["bicgstab", "chebyshev"])
@pytest.mark.parametrize("order", [1, 2])
def test_fused_sourced_steady_matches_scan(order, method):
    """Steady Gaussian emission on the fused uniform kernel (hoisted
    load scratch canvases) vs the scan path at the same iteration
    count."""
    from airpollution_tpu.problems import GaussianSourceProblem

    domain = Domain()
    problem = GaussianSourceProblem(q=30.0, xs=-4.0, ys=3.0, sigma_s=3.0)
    md = MeshData(create_mesh(10, 20.0), domain, nt=12)
    kw = (dict(solver_method="chebyshev", chebyshev_iters=12)
          if method == "chebyshev" else dict(fused_iters=5))
    ref_kw = (dict(solver_method="chebyshev", chebyshev_iters=12)
              if method == "chebyshev"
              else dict(solver_tol=1e-12, solver_maxiter=5))
    ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                     time_scheme_order=order, **ref_kw)
    u_ref = np.asarray(ref.solve(store_solutions=False))
    fused = CRBESolver(domain, problem, md, matvec_impl="fused",
                       time_scheme_order=order, **kw)
    u_fused = np.asarray(fused.solve(store_solutions=False))
    assert np.abs(u_ref).max() > 1e-3  # the source actually did something
    np.testing.assert_allclose(u_fused, u_ref, atol=3e-5)


@pytest.mark.parametrize("order", [1, 2])
def test_fused_sourced_time_dependent_matches_scan(order):
    """Time-dependent source through the default source_xy wrapper
    (per-step in-kernel evaluation; CN takes the t^n/t^{n+1} trapezoid)."""

    class PulsedSource(Problem):
        zero_source = False
        steady_source = False

        def source_term(self, xyt):
            import jax.numpy as jnp

            x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
            return (0.5 + 0.3 * t) * jnp.exp(-0.05 * (x**2 + y**2))

    domain, problem = Domain(), PulsedSource()
    md = MeshData(create_mesh(10, 20.0), domain, nt=12)
    ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                     time_scheme_order=order,
                     solver_tol=1e-12, solver_maxiter=6)
    u_ref = np.asarray(ref.solve(store_solutions=False))
    fused = CRBESolver(domain, problem, md, matvec_impl="fused",
                       time_scheme_order=order, fused_iters=6)
    u_fused = np.asarray(fused.solve(store_solutions=False))
    np.testing.assert_allclose(u_fused, u_ref, atol=3e-5)


def test_fused_sourced_strided_snapshots_match_scan():
    """snapshot_every chunks restart the kernel at t0 = k*dt*chunk — the
    sourced load must pick up mid-trajectory times correctly."""

    class RampSource(Problem):
        zero_source = False
        steady_source = False

        def source_term(self, xyt):
            import jax.numpy as jnp

            x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
            return t * jnp.exp(-0.05 * ((x - 2.0)**2 + y**2))

    domain, problem = Domain(), RampSource()
    md = MeshData(create_mesh(10, 20.0), domain, nt=13)
    ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                     solver_tol=1e-12, solver_maxiter=6)
    traj_ref = np.asarray(ref.solve(store_solutions=True))
    fused = CRBESolver(domain, problem, md, matvec_impl="fused",
                       fused_iters=6, snapshot_every=4)
    traj = np.asarray(fused.solve(store_solutions=True))
    assert traj.shape == (4, md.number_of_segments)
    np.testing.assert_allclose(traj, traj_ref[::4], atol=3e-5)


def test_fused_sourced_reference_quadrature_matches_scan():
    """source_quadrature='reference' (defect-D10 parity: raw dt*s) rides
    the same in-kernel evaluation path."""
    from airpollution_tpu.problems import GaussianSourceProblem

    domain = Domain()
    problem = GaussianSourceProblem(q=30.0, xs=0.0, ys=0.0, sigma_s=4.0)
    md = MeshData(create_mesh(9, 20.0), domain, nt=8)
    ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                     solver_tol=1e-12, solver_maxiter=6,
                     source_quadrature="reference")
    u_ref = np.asarray(ref.solve(store_solutions=False))
    fused = CRBESolver(domain, problem, md, matvec_impl="fused",
                       fused_iters=6, source_quadrature="reference")
    u_fused = np.asarray(fused.solve(store_solutions=False))
    # The raw add is O(1/h^2) larger than the lumped load — make sure the
    # two conventions genuinely differ on this problem, then match.
    lumped = CRBESolver(domain, problem, md, matvec_impl="uniform",
                        solver_tol=1e-12, solver_maxiter=6)
    u_lumped = np.asarray(lumped.solve(store_solutions=False))
    assert np.abs(u_ref - u_lumped).max() > 1e-3
    np.testing.assert_allclose(u_fused, u_ref, atol=2e-4)
