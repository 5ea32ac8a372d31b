"""Quasi-static solves for TIME-VARYING coefficients (unsteady wind).

Real air-quality wind fields change over the simulation horizon (diurnal
turning, frontal passages); the reference's family — and CRBESolver's
assemble-once design — model a frozen wind. This driver applies the
standard operational approximation: the horizon is split into chunks of
``reassemble_every`` time steps, the operator is reassembled from the
coefficient hooks sampled at each chunk's MIDPOINT time (second-order in
the chunk length), and the implicit scan advances chunk by chunk. One
jitted chunk program — traced in (u0, t0, problem) — serves every chunk
AND every problem-parameter value (the problem is a pytree argument), so
the host loop costs one dispatch per chunk, no recompiles.

Chunk-boundary exactness: the scan carries the HOMOGENEOUS state
(Dirichlet rows zero after the first step — models/crbe.run_time_loop,
defect-D7 semantics), and the boundary lift is applied to stored rows
only, so threading ``where(bmask, 0, lifted_last_row)`` into the next
chunk's ``u0`` reproduces the monolithic loop exactly when the operator
is chunk-independent (tested against CRBESolver on a frozen wind).

Oracle: problems.TurningWindProblem (spatially uniform wind turning in
time — closed form via the integrated trajectory). Differentiable:
``differentiable=True`` threads lax.custom_linear_solve through every
chunk, so ``jax.grad`` w.r.t. problem parameters (e.g. the turning rate
``omega_t``) is the exact discrete adjoint of the quasi-static scheme.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp

from airpollution_tpu.models.crbe import assemble, run_time_loop

# One compiled chunk program per (mesh id, static config): the chunk
# body is traced in (u0, t0) and the problem pytree, so sweeps and
# gradient fits reuse it across parameter values.
_CHUNK_CACHE: dict = {}
_CHUNK_CACHE_MAX = 8


def solve_time_varying(problem, mesh_data, *, reassemble_every: int,
                       time_scheme_order: int = 1,
                       stiffness_convention: str = "correct",
                       tol: float = 1e-8, maxiter: int = 200,
                       solver: str = "bicgstab", chebyshev_iters: int = 8,
                       extrapolate_warm_start: bool = False,
                       differentiable: bool = False,
                       source_quadrature: str = "mass_lumped",
                       store_solutions: bool = True):
    """Solve a ``time_varying`` problem; returns the (nt, n) trajectory
    with CRBESolver.solve(store_solutions=True) row semantics (row 0 =
    full IC, later rows boundary-lifted at their own time), or the
    boundary-lifted final state as (1, n) with
    ``store_solutions=False`` — at large nt the full trajectory is the
    memory bill, not the solve.

    ``reassemble_every`` must divide nt-1; the wind/diffusion hooks are
    sampled at each chunk's midpoint time. ``reassemble_every = nt - 1``
    is the frozen-wind limit (one assembly at T/2).
    """
    md = mesh_data
    n_steps = md.nt - 1
    k = int(reassemble_every)
    if k < 1 or n_steps % k:
        raise ValueError("reassemble_every must be a positive divisor "
                         "of nt-1")
    if not getattr(problem, "time_varying", False):
        raise ValueError(
            "solve_time_varying is for problem.time_varying=True; "
            "steady problems belong to CRBESolver"
        )
    n_chunks = n_steps // k
    dt = float(md.domain.T) / n_steps
    view = SimpleNamespace(midpoints=md.midpoints,
                           boundary_mask=md.boundary_mask, nt=k + 1)
    bmask = md.boundary_mask

    def chunk(u0_c, t0_c, prob):
        # Operator frozen at the chunk midpoint (quasi-static; the O(k
        # dt)^2 midpoint sampling matches CN's order).
        ops = assemble(md, prob, dt, time_scheme_order,
                       stiffness_convention,
                       coeff_time=t0_c + 0.5 * k * dt)
        sols, _ = run_time_loop(
            ops, u0_c, mesh_data=view, problem=prob, dt=dt,
            order=time_scheme_order, tol=tol, maxiter=maxiter,
            store_solutions=store_solutions, t0=t0_c,
            differentiable=differentiable,
            extrapolate_warm_start=extrapolate_warm_start,
            solver=solver, chebyshev_iters=chebyshev_iters,
            source_quadrature=source_quadrature,
        )
        # Stored rows are boundary-lifted (and store_solutions=False
        # returns the lifted final row); the homogeneous carry has zero
        # Dirichlet rows, so stripping the lift is exact.
        u_next = jnp.where(bmask, 0.0, sols[-1])
        return (sols[1:] if store_solutions else sols[-1:]), u_next

    cache_key = (id(md), type(problem), k, time_scheme_order,
                 stiffness_convention, float(tol), int(maxiter), solver,
                 int(chebyshev_iters), bool(extrapolate_warm_start),
                 bool(differentiable), source_quadrature,
                 bool(store_solutions))
    if cache_key in _CHUNK_CACHE:
        chunk_fn = _CHUNK_CACHE[cache_key]
    else:
        chunk_fn = jax.jit(chunk)
        _CHUNK_CACHE[cache_key] = chunk_fn
        while len(_CHUNK_CACHE) > _CHUNK_CACHE_MAX:
            _CHUNK_CACHE.pop(next(iter(_CHUNK_CACHE)))

    u = jnp.asarray(problem.initial_condition_fn(md.midpoints))
    rows = [u[None, :]]  # row 0: the full IC (crbe.py:364 semantics)
    out = None
    for c in range(n_chunks):
        out, u = chunk_fn(u, jnp.asarray(c * k * dt, u.dtype), problem)
        if store_solutions:
            rows.append(out)
    if not store_solutions:
        return out  # (1, n): the lifted final state
    return jnp.concatenate(rows, axis=0)
