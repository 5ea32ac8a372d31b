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

    s = CRBESolver(domain, SourcedProblem(), md, matvec_impl="fused")
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
