"""Multi-species advection-diffusion with coupled linear chemistry.

The reference evolves exactly one scalar field (crbe.py:225-482) and its
``reaction`` hook here is a scalar decay folded into the operator
(models/crbe.assemble). Real air-quality runs carry several coupled
species — decay chains, scavenging, linearized NOx/O3-style mechanisms —
i.e. a (K, K) chemistry matrix R in

    dt c_k + v_k . grad c_k - D_k lap c_k + (R c)_k = s_k.

This module solves that system by Strang chemistry-transport splitting,
the standard CTM construction, mapped TPU-first:

    c^{n+1} = E_h T_dt E_h c^n,     E_h = expm(-R dt/2)

- **Chemistry is exact**: the matrix exponential of the mechanism is
  computed ONCE per solve (jax.scipy.linalg.expm of a tiny (K, K)
  matrix) and each half-step is a single (K, K) x (K, N) matmul over all
  DOFs — MXU work with no stiffness constraint, even for mechanisms far
  stiffer than the transport dt.
- **Transport reuses the implicit CR step** (models/crbe.run_time_loop
  semantics: fixed masked operator, warm-started Jacobi-BiCGStab or
  reduction-free Chebyshev), vmapped over the species axis. When every
  species shares (v, D) one assembled operator serves all K solves;
  otherwise the per-species ELL operators are tree-stacked and the
  Krylov solve vmaps over (operator, rhs) pairs.
- **Accuracy**: the splitting is second order in dt, so with
  Crank-Nicolson transport (time_scheme_order=2) the scheme is O(dt^2)
  overall; with Backward Euler the O(dt) transport error dominates.
  When transport and chemistry commute (shared v, D) the splitting is
  EXACT in the chemistry direction: E_h^(2(nt-1)) telescopes to
  expm(-R T) with no splitting error at all, which is what the
  expm-mixture oracle (problems.MultiSpeciesProblem.analytical_solution)
  tests.

Boundary semantics mirror the single-species loop (reference defect D7,
deliberately preserved): the scan evolves the homogeneous variable and
the Dirichlet lift is added only to stored snapshots (crbe.py:429).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm

from airpollution_tpu.models.crbe import (GlobalOperators, assemble,
                                          obstacle_masks, robin_terms)
from airpollution_tpu.ops import linalg, sparse

__all__ = ["MultiSpeciesSolver", "run_multispecies_loop", "stack_operators"]


def stack_operators(ops_list) -> GlobalOperators:
    """Stack per-species GlobalOperators along a new leading species axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *ops_list)


def run_multispecies_loop(ops: GlobalOperators, C0, *, mesh_data, problem,
                          dt, order, tol, maxiter, store_solutions=True,
                          solver="bicgstab", chebyshev_iters=8,
                          source_quadrature="mass_lumped", t0=0.0,
                          matvec=None, ka_matvec=None,
                          differentiable=False, R=None):
    """Strang-split multi-species time loop as a pure traceable function.

    ``ops`` either has the single-species shapes (shared transport: one
    operator serves every species) or a leading species axis on every
    leaf (per-species operators, see :func:`stack_operators`). ``C0`` is
    the (K, N) initial state. Returns ``(solutions, None)`` with
    solutions shaped (nt, K, N) (or (1, K, N) for final-state-only),
    mirroring models/crbe.run_time_loop.

    ``matvec``/``ka_matvec``: optional single-vector closures replacing
    the ELL matvecs (shared transport only) — how the family-layout
    stencil/uniform fast paths plug in (the species axis is added here
    with ``vmap``, exactly as for ELL).

    ``differentiable=True`` wraps every transport solve in
    ``linalg.differentiable_solve`` (implicit-function VJP) and
    checkpoints the step, so ``jax.grad`` flows through the whole
    coupled loop — including through the chemistry exponential (jax's
    ``expm`` carries a Fréchet-derivative JVP) — to the mechanism
    matrix ``R``, which may be passed explicitly as a TRACED override of
    ``problem.R`` (the basis of diagnostics/inverse.fit_chemistry).
    """
    md = mesh_data
    midpoints = md.midpoints
    # Robin/deposition walls (per-species spec, common side partition —
    # validated by MultiSpeciesProblem): the named sides leave the
    # Dirichlet mask; the alpha * |e| terms were folded into each
    # species' assembled operator. The homogeneous flux law only (g = 0,
    # also validated), so the RHS needs no load. Works in family layout
    # too: family_view carries geometry, so robin_terms derives the
    # reduced masks in family order.
    bmask = robin_terms(md, problem.species[0])[0]
    # Solid obstacles (common geometry, validated by MultiSpeciesProblem):
    # fully-interior DOFs are identity rows pinned to 0 across every
    # species — same treatment as models/crbe.run_time_loop. Chemistry
    # is linear, so the zero column stays exactly zero through expm.
    _, dead = obstacle_masks(md, problem.species[0])
    if dead is not None:
        bmask = bmask | dead
        C0 = jnp.where(dead[None, :], jnp.zeros((), C0.dtype), C0)
    nt = md.nt
    K, _ = C0.shape
    stacked = ops.mass_diag.ndim == 2
    if stacked and matvec is not None:
        raise ValueError("custom matvec closures need the shared-operator "
                         "layout (per-species stacked ops are ELL-only)")
    if solver not in ("bicgstab", "chebyshev"):
        raise ValueError(f"unknown solver {solver!r}")
    if differentiable and solver != "bicgstab":
        raise ValueError(
            "differentiable=True requires solver='bicgstab' (the "
            "implicit-function VJP wraps the Krylov solve)"
        )
    if source_quadrature not in ("mass_lumped", "reference"):
        raise ValueError(f"unknown source_quadrature {source_quadrature!r}")

    R = jnp.asarray(problem.R if R is None else R, dtype=C0.dtype)
    E_half = expm(-(0.5 * dt) * R)

    # (K, N)-broadcastable operator diagonals; matvecs over the stack.
    mass = ops.mass_diag if stacked else ops.mass_diag[None, :]

    if matvec is None and not stacked:
        matvec = partial(sparse.ell_matvec, ops.system)
        ka_matvec = partial(sparse.ell_matvec, ops.ka)

    if stacked:
        def ka_mv(X):
            return jax.vmap(sparse.ell_matvec)(ops.ka, X)
    else:
        def ka_mv(X):
            return jax.vmap(ka_matvec)(X)

    if solver == "chebyshev":
        # Per-species spectral interval of the Jacobi-preconditioned
        # operator, hoisted out of the scan (one unrolled python loop —
        # K is small and static).
        def one_bounds(k):
            if stacked:
                ops_k = jax.tree.map(lambda a: a[k], ops)
                mv = partial(sparse.ell_matvec, ops_k.system)
                diag = ops_k.system_diag
            else:
                mv, diag = matvec, ops.system_diag
            return linalg.power_bounds(
                mv, jnp.zeros_like(C0[0]), scale=1.0 / jnp.sqrt(diag),
            )
        bounds = [one_bounds(k) for k in range(K if stacked else 1)]
        bounds = bounds if stacked else bounds * K
        los = jnp.stack([b[0] for b in bounds])
        his = jnp.stack([b[1] for b in bounds])

        def solveK(B, X0):
            if stacked:
                def one(sys, diag, b, x0, lo, hi):
                    return linalg.chebyshev(
                        partial(sparse.ell_matvec, sys), b, x0=x0,
                        bounds=(lo, hi), iters=chebyshev_iters,
                        precond=linalg.jacobi_preconditioner(diag),
                    ).x
                return jax.vmap(one)(
                    ops.system, ops.system_diag, B, X0, los, his
                )

            def one(b, x0, lo, hi):
                return linalg.chebyshev(
                    matvec, b, x0=x0, bounds=(lo, hi),
                    iters=chebyshev_iters,
                    precond=linalg.jacobi_preconditioner(ops.system_diag),
                ).x
            return jax.vmap(one)(B, X0, los, his)
    else:
        def _solve_one(mv, diag, b, x0):
            precond = linalg.jacobi_preconditioner(diag)
            if differentiable:
                return linalg.differentiable_solve(
                    mv, b, x0=x0, tol=tol, maxiter=maxiter, precond=precond,
                )
            return linalg.bicgstab(
                mv, b, x0=x0, tol=tol, maxiter=maxiter, precond=precond,
            ).x

        def solveK(B, X0):
            if stacked:
                def one(sys, diag, b, x0):
                    return _solve_one(
                        partial(sparse.ell_matvec, sys), diag, b, x0
                    )
                return jax.vmap(one)(ops.system, ops.system_diag, B, X0)

            def one(b, x0):
                return _solve_one(matvec, ops.system_diag, b, x0)
            return jax.vmap(one)(B, X0)

    zero_source = getattr(problem, "zero_source", False)

    def rhs(U, t):
        if order == 1:
            B = mass * U
        else:
            B = mass * U - (0.5 * dt) * ka_mv(U)
        if not zero_source:
            if source_quadrature == "reference":
                # Reference defect D10 parity switch (crbe.py:391-394).
                B = B + dt * problem.sources(midpoints, t)
            else:
                if order == 1:
                    s = problem.sources(midpoints, t)
                else:
                    s = 0.5 * (problem.sources(midpoints, t)
                               + problem.sources(midpoints, t - dt))
                B = B + dt * mass * s
        return jnp.where(bmask[None, :], 0.0, B)

    def lift(t):
        lifted = jnp.where(
            bmask[None, :], problem.boundary_values(midpoints, t, R=R), 0.0
        )
        if dead is not None:
            # Dead DOFs sit inside the solid: pinned to 0, never lifted
            # with (meaningless) boundary data.
            lifted = jnp.where(dead[None, :], jnp.zeros((), lifted.dtype),
                               lifted)
        return lifted

    def step(carry, t):
        C, _ = carry
        # Chemistry half-step (exact), then implicit transport, then the
        # second chemistry half-step. Keeping both half-steps inside the
        # step (instead of merging interior pairs) costs two tiny (K, K)
        # matmuls per step and makes every stored snapshot a true
        # integer-step state.
        # precision=HIGHEST: the default TPU matmul precision is
        # bfloat16, whose ~8-bit mantissa rounds E_half entries like
        # exp(-r dt/2) ~ 0.998 onto a 0.008 grid — thousands of
        # half-steps then decay the chain by arbitrary wrong factors
        # (measured: 257^2/nt=1001 lost HALF the emitted mass on TPU
        # while CPU was exact). The (K, K) matmul is tiny; full f32
        # costs nothing.
        Ch = jnp.matmul(E_half, C, precision=jax.lax.Precision.HIGHEST)
        B = rhs(Ch, t)
        X0 = jnp.where(bmask[None, :], 0.0, Ch)
        U = solveK(B, X0)
        C_new = jnp.matmul(E_half, U,
                           precision=jax.lax.Precision.HIGHEST)
        out = (C_new + lift(t)) if store_solutions else None
        return (C_new, C), out

    ts = jnp.asarray(t0, C0.dtype) + dt * jnp.arange(1, nt, dtype=C0.dtype)
    # The remat trade of the single-species adjoint (run_time_loop): the
    # reverse pass re-solves each step once instead of storing every
    # Krylov residual.
    step_fn = jax.checkpoint(step) if differentiable else step
    (C_final, _), snaps = jax.lax.scan(step_fn, (C0, C0), ts)
    if store_solutions:
        solutions = jnp.concatenate([C0[None], snaps], axis=0)
    else:
        t_final = t0 + dt * (nt - 1)
        solutions = (C_final + lift(t_final))[None]
    return solutions, None


class MultiSpeciesSolver:
    """K-species CRBE solver with Strang-split linear chemistry.

    Same surface shape as :class:`airpollution_tpu.models.crbe.CRBESolver`
    (constructor, ``solve()`` -> solutions array, ``compute_errors()``)
    with a species axis: ``solve()`` returns (nt, K, n_seg). ``problem``
    is a :class:`airpollution_tpu.problems.MultiSpeciesProblem`.
    """

    def __init__(self, domain, problem, mesh_data, time_scheme_order=1, *,
                 solver_tol: float = 1e-7, solver_maxiter: int = 200,
                 stiffness_convention: str = "correct",
                 solver_method: str = "bicgstab", chebyshev_iters: int = 8,
                 source_quadrature: str = "mass_lumped",
                 matvec_impl: str = "auto", splitting: str = "auto",
                 snapshot_every=None, chebyshev_policy: str = "reroute",
                 fuse_chemistry: bool = True,
                 transport_solver_kwargs=None):
        if time_scheme_order not in (1, 2):
            raise ValueError(
                f"Order {time_scheme_order} numerical scheme not implemented"
            )
        if solver_method not in ("bicgstab", "chebyshev"):
            raise ValueError(f"unknown solver_method {solver_method}")
        if splitting not in ("auto", "strang", "commute"):
            raise ValueError(f"unknown splitting {splitting}")
        commute_ok = problem.shared_transport and problem.zero_source
        if splitting == "commute" and not commute_ok:
            raise ValueError(
                "splitting='commute' is exact only for shared (v, D) and "
                "zero sources (the chemistry and transport operators act "
                "on different axes and commute; sources break it) — use "
                "splitting='strang'"
            )
        # The commute route factorizes the coupled solve into K
        # independent single-species transport solves + an expm(-R t)
        # output mixture, unlocking EVERY single-species fast path
        # (fused VMEM/HBM Pallas kernels included) for multi-species
        # runs. 'auto' picks it whenever it is exact.
        self.splitting = ("commute" if commute_ok else "strang") \
            if splitting == "auto" else splitting
        self.transport_solver_kwargs = dict(transport_solver_kwargs or {})
        if self.transport_solver_kwargs and self.splitting != "commute":
            raise ValueError(
                "transport_solver_kwargs configure the single-species "
                "CRBESolver of the commute route only"
            )
        if matvec_impl not in ("auto", "ell", "stencil", "uniform",
                               "fused_hbm"):
            raise ValueError(f"unknown matvec_impl {matvec_impl}")
        # matvec_impl='fused_hbm': the canvas stripe kernel. Under the
        # commute split it simply rides CRBESolver (every species is a
        # single-species fused solve); under Strang it runs one
        # in-kernel-chemistry launch per step
        # (ops/pallas_hbm.fused_multispecies_canvas_hbm) — the
        # city-scale path for emission inventories + chemistry, where
        # commute is not exact. Shared transport + Chebyshev scope.
        if matvec_impl == "fused_hbm":
            if not problem.shared_transport:
                raise ValueError(
                    "matvec_impl='fused_hbm' needs shared (v, D) across "
                    "species (ONE coefficient stack serves every "
                    "species; per-species operators are ELL-only)"
                )
            if mesh_data.structured_n is None:
                raise ValueError(
                    "matvec_impl='fused_hbm' requires a structured mesh"
                )
            if solver_method != "chebyshev":
                raise ValueError(
                    "matvec_impl='fused_hbm' needs solver_method="
                    "'chebyshev' (the stripe kernels are reduction-free)"
                )
        # Robin/deposition walls (species-level spec): the per-DOF paths
        # only — ELL always; the family stencil matvec when transport is
        # shared (equal alphas; the assembled alpha*|e| diagonal rides
        # the extracted coefficients and robin_terms derives the reduced
        # masks in family order). The translation-invariant uniform
        # operator refuses. 'auto' keeps its routing: stencil for shared
        # transport on structured meshes, ELL otherwise (stacked
        # per-species operators are ELL-only anyway).
        if any(getattr(sp, "robin_sides", None) for sp in problem.species):
            if matvec_impl == "uniform":
                raise ValueError(
                    "Robin walls (species robin_sides) break translation "
                    "invariance — use matvec_impl='ell', 'stencil', or "
                    "'auto'"
                )
        # Solid obstacles (common geometry, validated by the problem
        # wrapper): the global-order ELL loop carries them exactly
        # (masked assembly + dead-DOF pinning in run_multispecies_loop);
        # the family-layout fast paths are not wired for permuted dead
        # masks here and refuse. 'auto' routes to ELL below.
        if getattr(problem, "obstacles", None):
            if matvec_impl in ("stencil", "uniform"):
                raise ValueError(
                    "interior obstacles (problem.obstacles) run on the "
                    "ELL multi-species path (or the canvas stripe "
                    "kernel) — use matvec_impl='ell', 'fused_hbm', or "
                    "'auto'"
                )
        if matvec_impl in ("stencil", "uniform"):
            if not problem.shared_transport:
                raise ValueError(
                    "family-layout fast paths need shared (v, D) across "
                    "species (per-species operators are ELL-only)"
                )
            if mesh_data.structured_n is None:
                raise ValueError(
                    "stencil matvec requires a structured mesh "
                    "(create_mesh-produced)"
                )
        if snapshot_every is not None and (
            snapshot_every < 1 or (mesh_data.nt - 1) % snapshot_every
        ):
            raise ValueError("snapshot_every must be a positive divisor "
                             "of nt-1")
        self.snapshot_every = snapshot_every
        self.chebyshev_policy = chebyshev_policy
        # Strang fused path only: one in-kernel-chemistry launch per
        # step (default) vs the per-species-launch A/B baseline.
        self.fuse_chemistry = fuse_chemistry
        self.matvec_impl = matvec_impl
        self.domain = domain
        self.problem = problem
        self.mesh_data = mesh_data
        self.dt = domain.T / (mesh_data.nt - 1)
        self.time_scheme_order = time_scheme_order
        self.solver_tol = solver_tol
        self.solver_maxiter = solver_maxiter
        self.stiffness_convention = stiffness_convention
        self.solver_method = solver_method
        self.chebyshev_iters = chebyshev_iters
        self.source_quadrature = source_quadrature
        self.solutions = None
        self.solve_time = None
        self._ops: Optional[GlobalOperators] = None
        self._solve_fn_cache = {}
        self._guard_checked = set()

    def build_global_matrices(self) -> GlobalOperators:
        """Assemble the transport operator(s): one when (v, D) is shared
        across species, a species-stacked set otherwise. Chemistry never
        enters the operator (species problems have reaction=0 by
        construction) — it lives entirely in the split exponential."""
        p = self.problem
        if p.shared_transport:
            self._ops = assemble(
                self.mesh_data, p.species[0], self.dt,
                self.time_scheme_order, self.stiffness_convention,
            )
        else:
            self._ops = stack_operators([
                assemble(self.mesh_data, sp, self.dt,
                         self.time_scheme_order, self.stiffness_convention)
                for sp in p.species
            ])
        self._solve_fn_cache.clear()
        self._guard_checked = set()
        return self._ops

    def _require_ops(self) -> GlobalOperators:
        if self._ops is None:
            self.build_global_matrices()
        return self._ops

    def set_initial_condition(self):
        return self.problem.initial_conditions(self.mesh_data.midpoints)

    def _use_stencil(self) -> bool:
        if self.matvec_impl == "ell":
            return False
        if self.matvec_impl in ("stencil", "uniform"):
            return True
        return (self.problem.shared_transport
                and self.mesh_data.structured_n is not None
                and not getattr(self.problem, "obstacles", None))

    def _fused_bounds(self, ops):
        """Eager shared spectral interval + applicability gate for the
        fused Strang path (models/crbe._check_chebyshev_applicable
        discipline: estimated once per operator set, host floats, and a
        divergence-prone spectrum must not silently burn a run on the
        Chebyshev-only stripe kernel)."""
        cached = getattr(self, "_fused_bounds_cache", None)
        if cached is not None and cached[0] is ops:
            return cached[1]
        from functools import partial as _partial

        from airpollution_tpu.ops import linalg, sparse

        mv = _partial(sparse.ell_matvec, ops.system)
        z = jnp.zeros_like(ops.system_diag)
        scale = 1.0 / jnp.sqrt(ops.system_diag)
        lo, hi = linalg.power_bounds(mv, z, scale=scale)
        beta = linalg.skew_norm(mv, z, scale=scale)
        # Shared gate implementation (ops/linalg.chebyshev_gate) — one
        # place for the thresholds/formulas across solvers.
        factor, k_rec, marginal = linalg.chebyshev_gate(
            lo, hi, beta, self.chebyshev_iters
        )
        if not (factor < linalg.CHEBYSHEV_FACTOR_GATE):
            msg = (
                f"Chebyshev worst-case convergence factor {factor:.3f} "
                f">= {linalg.CHEBYSHEV_FACTOR_GATE} (advection-dominated "
                f"operator) and the fused "
                f"multispecies path is Chebyshev-only — use "
                f"matvec_impl='ell'/'stencil' with "
                f"solver_method='bicgstab', or reduce dt"
            )
            if self.chebyshev_policy == "reroute":
                raise ValueError(msg)
            import warnings

            warnings.warn(msg + " (chebyshev_policy='warn': "
                          "proceeding anyway)", stacklevel=3)
        elif marginal:
            import warnings

            warnings.warn(
                f"chebyshev_iters={self.chebyshev_iters} gives only a "
                f"{1.0 / factor ** self.chebyshev_iters:.1f}x worst-case "
                f"per-step residual reduction (factor {factor:.3f}) — "
                f"long-horizon sourced solves may drift or diverge; use "
                f"chebyshev_iters>={k_rec} or more time steps (dt ~ h).",
                stacklevel=3,
            )
        bounds = (float(lo), float(hi))
        self._fused_bounds_cache = (ops, bounds)
        return bounds

    def _build_fused_solve_fn(self, store_solutions: bool):
        """Strang splitting on the canvas stripe kernel
        (ops/pallas_hbm.fused_multispecies_canvas_hbm): by default ONE
        in-kernel-chemistry launch per step — all K species' windows
        resident, both exact (K, K) half-step mixes as in-window FMAs,
        the coefficient windows streamed once for all species
        (``fuse_chemistry=False`` restores the round-3 per-species-
        launch + JAX-einsum baseline). The city-scale configuration for
        emission inventories + chemistry (where the exact 'commute'
        factorization does not apply); Robin alpha walls and interior
        obstacles ride the coefficients exactly like the
        single-species canvas path."""
        from airpollution_tpu.mesh.data import structured_grid
        from airpollution_tpu.ops import pallas_hbm
        from airpollution_tpu.ops import stencil as stencil_mod

        md = self.mesh_data
        strided = store_solutions and self.snapshot_every is not None
        if store_solutions and not strided:
            raise ValueError(
                "the fused multispecies path returns the final state "
                "only — pass snapshot_every=k to MultiSpeciesSolver for "
                "strided snapshots with store_solutions=True"
            )
        pattern = stencil_mod.get_pattern(md)
        perm = jnp.asarray(pattern.perm)
        inv = jnp.asarray(pattern.inv_perm)
        sp0 = self.problem.species[0]
        bmask = robin_terms(md, sp0)[0]
        _, dead = obstacle_masks(md, sp0)
        if dead is not None:
            bmask = bmask | dead
        robin = getattr(sp0, "robin_sides", None) or None
        rect = (pallas_hbm.robin_rect_bounds(pattern.c, robin)
                if robin else None)
        use_ka = self.time_scheme_order == 2
        n_steps = md.nt - 1
        dt = self.dt
        k_snap = self.snapshot_every if strided else None
        sourced = not self.problem.zero_source
        source_fns = tuple(
            None if getattr(sp, "zero_source", False) else sp.source_xy
            for sp in self.problem.species
        ) if sourced else None
        grid = structured_grid(md) if sourced else None
        lumped = self.source_quadrature == "mass_lumped"
        interpret = jax.default_backend() != "tpu"
        R_static = self.problem.R
        problem = self.problem
        chebyshev_iters = self.chebyshev_iters
        fuse_chemistry = self.fuse_chemistry

        def solve_impl(ops, C0, aux):
            perm_a, inv_a, midpoints_a, bmask_a, dead_a, bounds = aux
            if dead_a is not None:
                # Carve the IC out of the solid (run_multispecies_loop
                # parity; kernel state starts exactly 0 there — the
                # chemistry einsums preserve the zero columns).
                C0 = jnp.where(dead_a[None, :], jnp.zeros((), C0.dtype),
                               C0)
            coeffs = stencil_mod.extract_coefficients(
                pattern, ops.system.vals
            )
            bmask_fam = bmask_a[perm_a]
            mass_fam = jnp.where(bmask_fam, 0.0, ops.mass_diag[perm_a])
            inv_diag_fam = 1.0 / ops.system_diag[perm_a]
            R = jnp.asarray(R_static, C0.dtype)
            E_half = expm(-(0.5 * dt) * R)
            # Divergence guard (judge W3): checked per snapshot chunk
            # when strided, else every ~64 steps; a diverged run stops
            # launching kernels and fn() below raises.
            out, bad = pallas_hbm.fused_multispecies_canvas_hbm(
                pattern, coeffs, mass_fam, inv_diag_fam,
                C0[:, perm_a], E_half,
                n_steps=n_steps, n_iters=chebyshev_iters,
                bounds=bounds, use_ka=use_ka, rect=rect,
                snapshot_every=k_snap, source_fns=source_fns,
                fuse_chemistry=fuse_chemistry,
                source_lumped=lumped, grid=grid, dt=dt,
                guard_every=pallas_hbm.guard_stride(n_steps),
                interpret=interpret,
            )

            def lift(t):
                lifted = jnp.where(
                    bmask_a[None, :],
                    problem.boundary_values(midpoints_a, t, R=R), 0.0
                )
                if dead_a is not None:
                    lifted = jnp.where(
                        dead_a[None, :], jnp.zeros((), lifted.dtype),
                        lifted
                    )
                return lifted

            if not strided:
                t_final = jnp.asarray(dt * n_steps, C0.dtype)
                return (out[:, inv_a] + lift(t_final))[None], bad
            times = dt * k_snap * jnp.arange(
                1, n_steps // k_snap + 1, dtype=C0.dtype
            )
            rows = out[:, :, inv_a] + jax.vmap(lift)(times)
            return jnp.concatenate([C0[None], rows], axis=0), bad

        jfn = jax.jit(solve_impl)
        midpoints = jnp.asarray(md.midpoints)
        bmask_arr = jnp.asarray(bmask)

        guard_state = {"checked": False}

        def fn(ops, C0):
            from airpollution_tpu.ops import linalg

            bounds = self._fused_bounds(ops)
            aux = (perm, inv, midpoints, bmask_arr, dead, bounds)
            sols, bad = jfn(ops, C0, aux)
            # One host read per compiled program (a device->host round
            # trip costs ~10-50 ms on the tunnel; divergence of this
            # configuration is deterministic — models/crbe wrapped()).
            if not guard_state["checked"]:
                guard_state["checked"] = True
                b = int(bad)
                if b >= 0:
                    raise FloatingPointError(linalg.divergence_message(
                        "MultiSpeciesSolver fused solve", b, n_steps,
                        chebyshev_iters,
                    ))
            return sols

        return fn

    def _build_solve_fn(self, store_solutions: bool):
        if self.matvec_impl == "fused_hbm":
            return self._build_fused_solve_fn(store_solutions)
        base = dict(
            problem=self.problem, dt=self.dt,
            order=self.time_scheme_order,
            tol=self.solver_tol, maxiter=self.solver_maxiter,
            store_solutions=store_solutions, solver=self.solver_method,
            chebyshev_iters=self.chebyshev_iters,
            source_quadrature=self.source_quadrature,
        )
        if not self._use_stencil():
            def solve_impl(ops, C0):
                return run_multispecies_loop(
                    ops, C0, mesh_data=self.mesh_data, **base,
                )[0]
            return jax.jit(solve_impl)

        # Family-layout fast path (shared transport): gather-free stencil
        # (or 15-scalar uniform) matvecs exactly as in CRBESolver's scan
        # path — the K-species state is permuted into family grids once
        # per solve and the species axis rides on a vmap of the same
        # single-vector closures.
        from airpollution_tpu.ops import stencil as stencil_mod

        md = self.mesh_data
        pattern = stencil_mod.get_pattern(md)
        perm = jnp.asarray(pattern.perm)
        inv = jnp.asarray(pattern.inv_perm)
        fam_view = stencil_mod.family_view(md, pattern)

        if self.matvec_impl == "uniform":
            from airpollution_tpu.ops import uniform as uniform_mod

            spec = uniform_mod.build_uniform_spec(pattern)

            def family_ops(ops):
                return uniform_mod.uniform_family_operators(
                    spec, pattern, ops, self.time_scheme_order
                )
        else:
            def family_ops(ops):
                return stencil_mod.family_operators(
                    pattern, ops, self.time_scheme_order, None
                )

        def solve_impl(ops, C0):
            ops_fam, matvec, ka_matvec = family_ops(ops)
            sols_fam = run_multispecies_loop(
                ops_fam, C0[:, perm], mesh_data=fam_view,
                matvec=matvec, ka_matvec=ka_matvec, **base,
            )[0]
            return sols_fam[:, :, inv]

        return jax.jit(solve_impl)

    def _solve_commute(self, store_solutions: bool):
        """The factorized route: K independent single-species transport
        solves + an expm(-R t) species mixture applied to the stored
        rows.

        Exact (not a splitting approximation) because with shared (v, D)
        and zero sources the chemistry operator acts on the species axis
        and the transport step on the space axis of the (K, N) state —
        ``(E_h (x) I)(I (x) T)(E_h (x) I) = E (x) T`` — so n steps
        telescope to ``expm(-R t_n) (x) T^n``. The boundary lift commutes
        the same way: the mixed uncoupled lifts ARE the coupled boundary
        values (problems.MultiSpeciesProblem.boundary_values). Each
        species reuses the FULL single-species machinery — pass
        ``transport_solver_kwargs`` (e.g. ``matvec_impl='fused'``,
        ``snapshot_every=k``) through to CRBESolver; note each species
        compiles its own program (problem constants are baked into the
        jitted closures).
        """
        import time

        from airpollution_tpu.models.crbe import CRBESolver

        base = dict(
            time_scheme_order=self.time_scheme_order,
            solver_tol=self.solver_tol,
            solver_maxiter=self.solver_maxiter,
            stiffness_convention=self.stiffness_convention,
            solver_method=self.solver_method,
            chebyshev_iters=self.chebyshev_iters,
            matvec_impl=self.matvec_impl,
            chebyshev_policy=self.chebyshev_policy,
        )
        if self.snapshot_every is not None:
            base["snapshot_every"] = self.snapshot_every
        base.update(self.transport_solver_kwargs)
        if getattr(self, "_transport_solvers", None) is None:
            self._transport_solvers = [
                CRBESolver(self.domain, sp, self.mesh_data, **base)
                for sp in self.problem.species
            ]
            # Shared (v, D): one assembly serves every species.
            ops0 = self._transport_solvers[0].build_global_matrices()
            for s in self._transport_solvers[1:]:
                s._ops = ops0

        t_start = time.time()
        per_species = [
            s.solve(store_solutions=store_solutions)
            for s in self._transport_solvers
        ]
        S = jnp.stack(per_species)  # (K, rows, N)
        n_rows = S.shape[1]
        md = self.mesh_data
        if store_solutions and n_rows > 1:
            k_snap = (md.nt - 1) // (n_rows - 1)
            t_rows = self.dt * k_snap * jnp.arange(n_rows, dtype=S.dtype)
        else:
            t_rows = jnp.asarray([self.domain.T], dtype=S.dtype)
        R = self.problem.R.astype(S.dtype)
        E_all = jax.vmap(lambda t: expm(-t * R))(t_rows)  # (rows, K, K)
        mixed = jnp.einsum("tkj,jtn->tkn", E_all, S,
                           precision=jax.lax.Precision.HIGHEST)
        self.solutions = jax.block_until_ready(mixed)
        self.solve_time = time.time() - t_start
        return self.solutions

    def _config_key(self):
        """Every solver attribute the jitted solve closures bake in
        (mirrors CRBESolver._config_key — mutating any of these after a
        solve() must not silently reuse a stale compiled program)."""
        return (
            self.time_scheme_order, self.solver_tol, self.solver_maxiter,
            self.solver_method, self.chebyshev_iters, self.matvec_impl,
            self.splitting, self.snapshot_every, self.chebyshev_policy,
            self.stiffness_convention, self.fuse_chemistry,
        )

    def solve(self, store_solutions: bool = True):
        import time

        if self.splitting == "commute":
            return self._solve_commute(store_solutions)
        ops = self._require_ops()
        key = (store_solutions,) + self._config_key()
        fn = self._solve_fn_cache.get(key)
        if fn is None:
            fn = self._solve_fn_cache[key] = self._build_solve_fn(
                store_solutions
            )
        C0 = self.set_initial_condition()
        t_start = time.time()
        self.solutions = jax.block_until_ready(fn(ops, C0))
        self.solve_time = time.time() - t_start
        if key not in self._guard_checked:
            # Once per compiled config: the host read is a tunnel round
            # trip and divergence is deterministic (models/crbe.solve).
            self._guard_checked.add(key)
            final = self.solutions[-1]
            from airpollution_tpu.ops import linalg

            if bool(linalg.diverged_state(final, jnp.linalg.norm(C0))):
                raise FloatingPointError(linalg.divergence_message(
                    "MultiSpeciesSolver.solve", self.mesh_data.nt - 1,
                    self.mesh_data.nt - 1,
                    self.chebyshev_iters
                    if self.solver_method == "chebyshev" else None,
                ))
        return self.solutions

    def compute_errors(self):
        """Per-species and aggregate error metrics at t=T vs the oracle.

        Same unweighted vector norms as the single-species paths
        (crbe.py:447-453) applied per species, plus the aggregate over
        the flattened (K, N) state. Requires the expm-mixture oracle
        (problem.has_analytical)."""
        if self.solutions is None:
            raise ValueError("call solve() first")
        md = self.mesh_data
        C = self.solutions[-1]  # (K, N)
        C_ex = self.problem.analytical_solution(md.midpoints, self.domain.T)
        C_ex = C_ex.astype(C.dtype)
        err = C - C_ex

        def norms(e, ex):
            l2 = jnp.linalg.norm(e)
            return {
                "max_error": float(jnp.max(jnp.abs(e))),
                "l2_error": float(l2),
                "rel_l2_error": float(l2 / jnp.linalg.norm(ex)),
            }

        per_species = [norms(err[k], C_ex[k])
                       for k in range(self.problem.n_species)]
        total = norms(err.reshape(-1), C_ex.reshape(-1))
        total["per_species"] = per_species
        return total
