"""HBM-tiled fused solver (ops/pallas_hbm.py) vs the VMEM fused kernel.

The stripe kernel must reproduce ops/pallas_solver.fused_solve_uniform
(method="chebyshev") exactly: same algorithm, different tiling. Stripe
sizes are forced small so multi-stripe sweeps, window clamping at both
canvas edges, and ragged last stripes are all exercised on tiny meshes.
"""

import pytest as _pytest

pytestmark = _pytest.mark.kernels


import jax.numpy as jnp
import pytest
from functools import partial

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.ops import (
    linalg,
    pallas_hbm,
    pallas_solver,
    stencil as stencil_mod,
    uniform as uniform_mod,
)


@pytest.fixture(scope="module")
def setup():
    # ms=33 with 8-row stripes gives windows that are clamped at both
    # canvas edges AND free-floating in the middle (n_pad=40 > W=24).
    ms, nt = 33, 9
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    return domain, problem, md


def _pieces(domain, problem, md, order):
    solver = CRBESolver(domain, problem, md, time_scheme_order=order)
    ops = solver.build_global_matrices()
    pattern = stencil_mod.get_pattern(md)
    spec = uniform_mod.build_uniform_spec(pattern)
    perm = jnp.asarray(pattern.perm)
    u0 = solver.set_initial_condition()[perm]
    consts = uniform_mod.extract_constants(spec, ops.system.vals)
    mass_c = uniform_mod.family_constants(spec, ops.mass_diag)
    inv_diag_c = 1.0 / uniform_mod.family_constants(spec, ops.system_diag)
    matvec = partial(uniform_mod.uniform_matvec, spec, consts)
    bounds = linalg.power_bounds(
        matvec, jnp.zeros_like(u0),
        scale=1.0 / jnp.sqrt(ops.system_diag[perm]),
    )
    return spec, consts, mass_c, inv_diag_c, u0, bounds


@pytest.mark.parametrize("order,extrapolate", [(1, False), (1, True),
                                               (2, True)])
@pytest.mark.parametrize("stripe_rows", [8, 16, 40])
def test_matches_vmem_fused(setup, order, extrapolate, stripe_rows):
    domain, problem, md = setup
    spec, consts, mass_c, idc, u0, bounds = _pieces(
        domain, problem, md, order
    )
    kw = dict(n_steps=md.nt - 1, n_iters=6, use_ka=(order == 2),
              extrapolate=extrapolate)
    ref = pallas_solver.fused_solve_uniform(
        spec, consts, mass_c, idc, u0, method="chebyshev", bounds=bounds,
        interpret=True, **kw,
    )
    got = pallas_hbm.fused_solve_uniform_hbm(
        spec, consts, mass_c, idc, u0, bounds=bounds,
        stripe_rows=stripe_rows, interpret=True, **kw,
    )
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-12 * float(
        jnp.max(jnp.abs(ref))
    ) + 1e-14


def test_solver_level_dispatch(setup):
    """matvec_impl='fused_hbm' reproduces 'fused' through CRBESolver.
    Kernel-equality at fixed iterations: the fixture's dt is in the
    divergence regime on purpose, so opt out of the auto-reroute."""
    domain, problem, md = setup
    kw = dict(solver_method="chebyshev", chebyshev_iters=8,
              extrapolate_warm_start=True, chebyshev_policy="warn")
    a = CRBESolver(domain, problem, md, matvec_impl="fused", **kw).solve(
        store_solutions=False, collect_iters=False
    )
    b = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                   **kw).solve(store_solutions=False, collect_iters=False)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-10


def test_hbm_requires_chebyshev(setup):
    domain, problem, md = setup
    solver = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                        solver_method="bicgstab")
    with pytest.raises(ValueError, match="chebyshev"):
        solver.solve(store_solutions=False, collect_iters=False)


def test_patch_constants_match_full_extraction(setup):
    """ops/uniform.patch_constants == full-mesh ELL extraction up to
    coordinate rounding (the patch mesh has the same cell size)."""
    domain, problem, md = setup
    spec, consts, mass_c, diag_c, _, _ = _pieces(domain, problem, md, 1)
    solver = CRBESolver(domain, problem, md)
    p_consts, _, p_mass, p_diag = uniform_mod.patch_constants(
        md.structured_n, float(domain.Lx), problem, solver.dt, 1,
    )
    assert jnp.allclose(jnp.asarray(consts), p_consts, rtol=1e-10)
    assert jnp.allclose(mass_c, p_mass, rtol=1e-10)
    # diag_c in _pieces is already inverted; invert back.
    assert jnp.allclose(1.0 / diag_c, p_diag, rtol=1e-10)


def test_patch_assembly_solve_matches_full(setup):
    """assembly='patch' reproduces the full-assembly fused solve without
    ever building the global operator. (Kernel equality — reroute
    opted out, see test_solver_level_dispatch.)"""
    domain, problem, md = setup
    kw = dict(solver_method="chebyshev", chebyshev_iters=8,
              extrapolate_warm_start=True, chebyshev_policy="warn")
    a = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                   **kw).solve(store_solutions=False, collect_iters=False)
    s = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                   assembly="patch", **kw)
    b = s.solve(store_solutions=False, collect_iters=False)
    assert s._ops is None  # the global operator was never assembled
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) < 1e-9 * scale


def test_patch_uniform_scan_matches_full(setup):
    """assembly='patch' + matvec_impl='uniform': the general scan path
    (snapshots, BiCGStab, nonzero sources) without the global operator."""
    domain, problem, md = setup

    class SourceProblem(apt.Problem):
        zero_source = False

        def source_term(self, xyt):
            return jnp.full(xyt.shape[:-1], 0.3, xyt.dtype)

    src = SourceProblem(sigma=1.0)
    for order in (1, 2):
        a = CRBESolver(domain, src, md, matvec_impl="uniform",
                       time_scheme_order=order).solve()
        s = CRBESolver(domain, src, md, matvec_impl="uniform",
                       time_scheme_order=order, assembly="patch")
        b = s.solve()
        assert s._ops is None
        scale = float(jnp.max(jnp.abs(a)))
        # BiCGStab stops at tol=1e-7: two operators differing only by
        # patch-coordinate rounding give tolerance-level answer diffs.
        assert float(jnp.max(jnp.abs(a - b))) < 1e-6 * scale


def test_patch_requires_uniform_fused(setup):
    domain, problem, md = setup
    with pytest.raises(ValueError, match="patch"):
        CRBESolver(domain, problem, md, matvec_impl="stencil",
                   assembly="patch").solve(store_solutions=False)


def test_rebuild_invalidates_cached_bounds(setup):
    """build_global_matrices() must drop the cached spectral bounds and
    jitted solve closures (they bake the old operator's interval)."""
    domain, problem, md = setup
    s = CRBESolver(domain, problem, md, matvec_impl="fused",
                   solver_method="chebyshev", chebyshev_iters=8,
                   chebyshev_policy="warn")
    a = s.solve(store_solutions=False, collect_iters=False)
    old_bounds = s._cheb_bounds
    s.build_global_matrices()
    assert s._cheb_bounds is None and not s._solve_fn_cache
    b = s.solve(store_solutions=False, collect_iters=False)
    assert s._cheb_bounds is not None
    assert jnp.allclose(jnp.asarray(s._cheb_bounds),
                        jnp.asarray(old_bounds))
    assert float(jnp.max(jnp.abs(a - b))) < 1e-12


def test_strided_snapshots_match_scan(setup):
    """snapshot_every: fused paths emit strided trajectories that match
    the scan path's stored snapshots (chunked kernel sweeps; the warm
    start resets at chunk boundaries, hence the loose-ish tolerance)."""
    domain, problem, md = setup
    # The module fixture's nt=9 has dt deep in Chebyshev's divergence
    # regime; snapshots need a convergent configuration.
    md_fine = apt.MeshData(md.mesh, domain, nt=65)
    scan = CRBESolver(domain, problem, md_fine, matvec_impl="uniform",
                      extrapolate_warm_start=True)
    full = scan.solve(store_solutions=True)  # (nt, n_seg)
    for impl in ("fused", "fused_hbm"):
        s = CRBESolver(domain, problem, md_fine, matvec_impl=impl,
                       solver_method="chebyshev", chebyshev_iters=10,
                       extrapolate_warm_start=True, snapshot_every=8)
        snaps = s.solve(store_solutions=True)
        assert snaps.shape == ((md_fine.nt - 1) // 8 + 1, full.shape[1])
        ref = full[::8]
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(snaps - ref))) < 1e-5 * scale


def test_strided_snapshots_scan_path(setup):
    """snapshot_every also strides the scan paths' stored trajectory
    (same row <-> time contract as the fused chunked output)."""
    domain, problem, md = setup
    full = CRBESolver(domain, problem, md,
                      matvec_impl="uniform").solve(store_solutions=True)
    strided = CRBESolver(domain, problem, md, matvec_impl="uniform",
                         snapshot_every=4).solve(store_solutions=True)
    assert strided.shape[0] == (md.nt - 1) // 4 + 1
    assert float(jnp.max(jnp.abs(strided - full[::4]))) == 0.0


def test_strided_snapshots_require_divisor(setup):
    domain, problem, md = setup
    s = CRBESolver(domain, problem, md, matvec_impl="fused",
                   solver_method="chebyshev", snapshot_every=3)
    with pytest.raises(ValueError, match="divide"):
        s.solve(store_solutions=True)  # nt-1 = 8 not divisible by 3


def test_patch_rejects_spectral_preconditioner(setup):
    domain, problem, md = setup
    with pytest.raises(ValueError, match="patch"):
        CRBESolver(domain, problem, md, matvec_impl="uniform",
                   assembly="patch", preconditioner="spectral").solve(
            store_solutions=False)


def test_solve_honors_ic_override(setup):
    """solve() must route the IC through the public
    set_initial_condition hook (reference-parity subclass point)."""
    domain, problem, md = setup

    class Shifted(CRBESolver):
        def set_initial_condition(self):
            return super().set_initial_condition() + 1.0

    base = CRBESolver(domain, problem, md).solve()
    shifted = Shifted(domain, problem, md).solve()
    assert float(jnp.max(jnp.abs(shifted[0] - (base[0] + 1.0)))) < 1e-12


def test_choose_stripe_rows_budget():
    # Larger meshes get narrower stripes so the window set stays in VMEM.
    s_small = pallas_hbm.choose_stripe_rows(513, False, halo=8)
    s_big = pallas_hbm.choose_stripe_rows(4097, True, halo=8)
    assert s_small >= s_big
    w = s_big + 16
    assert 9 * 3 * w * pallas_hbm._lane_pad(4097) * 4 <= 31 * 1024 * 1024
    # Measured optimum at 513^2-1025^2: S=128 (hbm_ab.csv).
    assert pallas_hbm.choose_stripe_rows(1025, True, halo=16) == 128


@pytest.mark.parametrize("order,extrapolate", [(1, False), (2, True)])
def test_2d_tiles_match_vmem_fused(setup, order, extrapolate):
    """Lane-tiled (2D) windows reproduce the VMEM kernel bit-for-bit.

    ms=33 canvases lane-pad to 128+... too narrow to lane-tile, so this
    uses ms=140 (canvas 140 -> 256 padded lanes -> 2 lane tiles of
    SL=128 with a 128-lane halo), exercising lane-clamped windows on both
    sides plus interior row windows."""
    ms, nt = 140, 4
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    spec, consts, mass_c, idc, u0, bounds = _pieces(
        domain, problem, md, order
    )
    kw = dict(n_steps=md.nt - 1, n_iters=4, use_ka=(order == 2),
              extrapolate=extrapolate)
    ref = pallas_solver.fused_solve_uniform(
        spec, consts, mass_c, idc, u0, method="chebyshev", bounds=bounds,
        interpret=True, **kw,
    )
    got = pallas_hbm.fused_solve_uniform_hbm(
        spec, consts, mass_c, idc, u0, bounds=bounds,
        stripe_rows=48, stripe_lanes=128, interpret=True, **kw,
    )
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-12 * float(
        jnp.max(jnp.abs(ref))
    ) + 1e-14


def test_choose_tile_tall_stripes_at_lane_bound():
    """choose_tile keeps the measured-optimal full-lane stripes through
    2049^2 and, where the lane width alone would force S down to 32
    (judge finding W3), raises the window budget instead: S=160 at
    4097^2 (redundancy 1.2 vs 2.0 — measured +28%, hbm_ab.csv). 2D lane
    tiles measured slower than tall stripes, so SL always stays full."""
    for n, halo in ((513, 8), (1025, 16)):
        s, sl = pallas_hbm.choose_tile(n, True, halo)
        assert sl == pallas_hbm._lane_pad(n), (n, s, sl)
        assert s == pallas_hbm.choose_stripe_rows(n, True, halo)
    for n in (2049, 4097):
        s, sl = pallas_hbm.choose_tile(n, True, 16)
        assert (s, sl) == (160, pallas_hbm._lane_pad(n))
        red = (s + 2 * 16) / s
        assert red <= 1.2
        # Raised window budget respected (the measured-schedulable
        # envelope).
        assert (pallas_hbm._n_bufs(True) * 3 * (s + 32) * sl * 4
                <= pallas_hbm._TALL_BUDGET)


# --- Sourced stripe solves: the load is evaluated per tile on GLOBAL
# iota coordinates (window offset + lane offset), fed the step time via
# an SMEM input from the host-side scan. Oracle: the VMEM fused kernel
# (itself pinned against the scan path in tests/test_pallas_solver.py).


def _grid_of(md):
    import numpy as np

    pts = np.asarray(md.points)
    xmin, ymin = float(pts[:, 0].min()), float(pts[:, 1].min())
    h = (float(pts[:, 0].max()) - xmin) / (md.structured_n - 1)
    return (xmin, ymin, h)


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("stripe_rows", [8, 16])
def test_sourced_matches_vmem_fused(setup, order, stripe_rows):
    from airpollution_tpu.problems import GaussianSourceProblem

    domain, _, md32 = setup
    # f64 mesh: the tight tiling-equality tolerance below holds only in
    # f64 (the zero-source tests get f64 implicitly through the Problem
    # IC's promotion; GaussianSourceProblem's zero IC would keep f32).
    md = apt.MeshData(md32.mesh, domain, nt=md32.nt, dtype=jnp.float64)
    problem = GaussianSourceProblem(q=80.0, xs=-3.0, ys=2.0, sigma_s=5.0)
    spec, consts, mass_c, idc, u0, bounds = _pieces(
        domain, problem, md, order
    )
    dt = domain.T / (md.nt - 1)
    src = dict(source_fn=problem.source_xy, source_steady=True,
               grid=_grid_of(md), dt=dt)
    kw = dict(n_steps=md.nt - 1, n_iters=6, use_ka=(order == 2))
    ref = pallas_solver.fused_solve_uniform(
        spec, consts, mass_c, idc, u0, method="chebyshev", bounds=bounds,
        interpret=True, **kw, **src,
    )
    got = pallas_hbm.fused_solve_uniform_hbm(
        spec, consts, mass_c, idc, u0, bounds=bounds,
        stripe_rows=stripe_rows, interpret=True, **kw, **src,
    )
    assert float(jnp.max(jnp.abs(ref))) > 1e-3
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-10 * float(
        jnp.max(jnp.abs(ref))
    ) + 1e-12


def test_sourced_time_dependent_matches_vmem_fused(setup):
    """Time-dependent source: the per-step t^{n+1} rides the SMEM input
    (host-scan xs) and CN takes the in-kernel trapezoid."""
    domain, base_problem, md32 = setup
    md = apt.MeshData(md32.mesh, domain, nt=md32.nt, dtype=jnp.float64)

    class Ramp(type(base_problem)):
        zero_source = False
        steady_source = False

        def source_term(self, xyt):
            x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
            return (0.2 + 0.1 * t) * jnp.exp(-0.03 * (x**2 + y**2))

        def source_xy(self, x, y, t):
            return (0.2 + 0.1 * t) * jnp.exp(-0.03 * (x**2 + y**2))

    problem = Ramp(sigma=1.0)
    spec, consts, mass_c, idc, u0, bounds = _pieces(domain, problem, md, 2)
    dt = domain.T / (md.nt - 1)
    src = dict(source_fn=problem.source_xy, source_steady=False,
               grid=_grid_of(md), dt=dt, t0=0.0)
    kw = dict(n_steps=md.nt - 1, n_iters=6, use_ka=True)
    ref = pallas_solver.fused_solve_uniform(
        spec, consts, mass_c, idc, u0, method="chebyshev", bounds=bounds,
        interpret=True, **kw, **src,
    )
    got = pallas_hbm.fused_solve_uniform_hbm(
        spec, consts, mass_c, idc, u0, bounds=bounds,
        stripe_rows=8, interpret=True, **kw, **src,
    )
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-10 * float(
        jnp.max(jnp.abs(ref))
    ) + 1e-12


def test_sourced_solver_level_strided_matches_scan(setup):
    """End-to-end through CRBESolver: sourced fused_hbm with strided
    snapshots against the scan path (chunk t0 offsets included)."""
    from airpollution_tpu.problems import GaussianSourceProblem

    domain, _, md = setup
    md_fine = apt.MeshData(md.mesh, domain, nt=65)
    problem = GaussianSourceProblem(q=80.0, xs=-3.0, ys=2.0, sigma_s=5.0)
    scan = CRBESolver(domain, problem, md_fine, matvec_impl="uniform")
    full = scan.solve(store_solutions=True)
    s = CRBESolver(domain, problem, md_fine, matvec_impl="fused_hbm",
                   solver_method="chebyshev", chebyshev_iters=10,
                   snapshot_every=16)
    snaps = s.solve(store_solutions=True)
    ref = full[::16]
    scale = float(jnp.max(jnp.abs(ref)))
    assert scale > 1e-3
    assert float(jnp.max(jnp.abs(snaps - ref))) < 1e-5 * scale


# --- Canvas-operator stripe kernel (fused_solve_canvas_hbm): the
# spatially-varying-coefficient counterpart. On a CONSTANT-coefficient
# operator its canvases represent exactly the uniform operator, so it
# must reproduce the uniform stripe kernel; on variable coefficients the
# scan-path Chebyshev (same fixed iterations, same bounds) is the oracle.


def _canvas_pieces(domain, problem, md, order):
    solver = CRBESolver(domain, problem, md, time_scheme_order=order)
    ops = solver.build_global_matrices()
    pattern = stencil_mod.get_pattern(md)
    perm = jnp.asarray(pattern.perm)
    u0 = solver.set_initial_condition()[perm]
    coeffs = stencil_mod.extract_coefficients(pattern, ops.system.vals)
    bmask_fam = md.boundary_mask[perm]
    mass_fam = jnp.where(bmask_fam, 0.0, ops.mass_diag[perm])
    inv_diag_fam = 1.0 / ops.system_diag[perm]
    matvec = partial(stencil_mod.stencil_matvec, pattern, coeffs)
    bounds = linalg.power_bounds(
        matvec, jnp.zeros_like(u0),
        scale=1.0 / jnp.sqrt(ops.system_diag[perm]),
    )
    return pattern, coeffs, mass_fam, inv_diag_fam, u0, bounds


@pytest.mark.parametrize("order,extrapolate", [(1, False), (1, True),
                                               (2, True)])
@pytest.mark.parametrize("stripe_rows", [8, 16, 40])
def test_canvas_stripe_matches_uniform_stripe(setup, order, extrapolate,
                                              stripe_rows):
    domain, problem, md = setup
    spec, consts, mass_c, idc, u0, bounds = _pieces(
        domain, problem, md, order
    )
    kw = dict(n_steps=md.nt - 1, n_iters=6, use_ka=(order == 2),
              extrapolate=extrapolate, stripe_rows=stripe_rows,
              interpret=True, bounds=bounds)
    ref = pallas_hbm.fused_solve_uniform_hbm(
        spec, consts, mass_c, idc, u0, **kw
    )
    pattern, coeffs, mass_fam, inv_diag_fam, u0c, _ = _canvas_pieces(
        domain, problem, md, order
    )
    got = pallas_hbm.fused_solve_canvas_hbm(
        pattern, coeffs, mass_fam, inv_diag_fam, u0c, **kw
    )
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-11 * float(
        jnp.max(jnp.abs(ref))
    ) + 1e-13


@pytest.mark.parametrize("order", [1, 2])
def test_canvas_stripe_variable_wind_matches_scan(setup, order):
    """Solver-level: matvec_impl='fused_hbm' on a variable-coefficient
    problem routes to the canvas stripe kernel and reproduces the scan
    Chebyshev path (same iterations/bounds) in a diffusion-dominated
    (Chebyshev-convergent) configuration."""
    from airpollution_tpu.problems import RotatingPlumeProblem

    domain, _, md33 = setup
    md = apt.MeshData(md33.mesh, domain, nt=25, dtype=jnp.float64)
    p = RotatingPlumeProblem(omega=0.03, D=0.3)
    kw = dict(time_scheme_order=order, solver_method="chebyshev",
              chebyshev_iters=8, extrapolate_warm_start=True)
    ref = CRBESolver(domain, p, md, matvec_impl="stencil", **kw).solve(
        store_solutions=False, collect_iters=False
    )
    got = CRBESolver(domain, p, md, matvec_impl="fused_hbm", **kw).solve(
        store_solutions=False, collect_iters=False
    )
    scale = float(jnp.max(jnp.abs(ref)))
    assert scale > 1e-4
    # The scan path estimates its Chebyshev interval in-jit with the
    # stencil matvec while the fused path reuses the eager ELL-matvec
    # estimate: the (lo, hi) pair differs in the last bits, so the fixed
    # k-iteration polynomials differ at the 1e-6-relative level (the
    # bitwise algorithm check is test_canvas_stripe_matches_uniform_
    # stripe, where both sides share one bounds pair).
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-5 * scale


def test_canvas_stripe_sourced_strided_matches_scan(setup):
    """Sourced canvas-operator stripe solve (fused_operator='canvas'
    forces the per-DOF path even for this constant-coefficient emitter)
    with strided snapshots, against the scan path."""
    from airpollution_tpu.problems import GaussianSourceProblem

    domain, _, md33 = setup
    md = apt.MeshData(md33.mesh, domain, nt=65, dtype=jnp.float64)
    problem = GaussianSourceProblem(q=80.0, xs=-3.0, ys=2.0, sigma_s=5.0)
    scan = CRBESolver(domain, problem, md, matvec_impl="stencil")
    full = scan.solve(store_solutions=True)
    s = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                   fused_operator="canvas", solver_method="chebyshev",
                   chebyshev_iters=10, snapshot_every=16)
    snaps = s.solve(store_solutions=True)
    ref = full[::16]
    scale = float(jnp.max(jnp.abs(ref)))
    assert scale > 1e-3
    assert float(jnp.max(jnp.abs(snaps - ref))) < 1e-5 * scale


def test_canvas_bicgstab_past_vmem_raises(setup):
    """Canvas + BiCGStab past the VMEM envelope must refuse with the
    chebyshev hint (the stripe kernels are reduction-free only)."""
    domain, problem, md = setup
    s = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                   fused_operator="canvas", solver_method="bicgstab")
    with pytest.raises(ValueError, match="chebyshev"):
        s.solve(store_solutions=False, collect_iters=False)
