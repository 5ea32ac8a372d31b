"""Halo-exchange distributed CRBE solve: the uniform stencil over a mesh.

The row-sharded ELL path (parallel/fem_shard.py) moves the ENTIRE solution
vector through an ``all_gather`` on every matvec and reduces five inner
products per BiCGStab iteration. This module is the TPU-native scale-out
for structured meshes, built on two observations:

1. With the translation-invariant operator (ops/uniform.py) the matvec in
   canvas layout couples rows only at offsets {-1, 0, +1}, so a device
   holding a contiguous strip of canvas rows needs exactly ONE row from
   each neighbor: two ``jax.lax.ppermute`` transfers of a few KB per
   matvec, riding ICI point-to-point instead of an all-to-all.
   ``ppermute`` fills unpaired destinations with zeros — which is exactly
   the mesh-boundary semantics of the zero-padded canvases, so the edge
   devices need no special casing (and a 1-device mesh degenerates to the
   serial operator).
2. With Chebyshev iteration (ops/linalg.chebyshev) there are NO inner
   products, so a full implicit time step issues NO collectives at all
   beyond the halo exchanges — no psum, no all_gather, no global barrier
   per iteration. The spectral interval is estimated once on the
   replicated operator before sharding (ops/linalg.power_bounds).

Scope: any structured-mesh problem — source terms evaluate on sharded
coordinate canvases inside the shard_map (run_time_loop semantics:
lumped-mass load by default, D10-parity switch available);
backward Euler or Crank-Nicolson;
``snapshot_every=k`` strided trajectories (one stacked output per k-step
scan chunk, reassembled and boundary-lifted outside, matching the serial
``solutions[::k]`` contract); fixed-iteration Chebyshev (zero
collectives beyond the halos) or ``solver_method="bicgstab"`` — the
SAME linalg.bicgstab the serial path runs, with psum-reduced dot/norm
injected, costing 4 scalar psums per iteration but giving residual-based
early exit where Chebyshev's fixed count is wasteful. Dirichlet rows are
kept at zero throughout (the Krylov-invariant formulation of the fused
kernel: the RHS is masked, so identity rows never need to be applied)
and the boundary lift happens on the reassembled vectors outside the
shard_map.

Validated on the virtual 8-device CPU mesh against the serial scan path
(tests/test_parallel.py), including sources + strided snapshots.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from airpollution_tpu.models.crbe import GlobalOperators
from airpollution_tpu.ops import lifting
from airpollution_tpu.ops import linalg
from airpollution_tpu.ops import stencil as stencil_mod
from airpollution_tpu.ops import uniform as uniform_mod
from airpollution_tpu.ops.pallas_solver import from_canvases, to_canvases


def _halo_from_above(row, axis):
    """Device d receives device (d+1)'s ``row``; the last device zeros."""
    n_dev = jax.lax.axis_size(axis)
    perm = [(d, d - 1) for d in range(1, n_dev)]
    return jax.lax.ppermute(row, axis, perm)


def _halo_from_below(row, axis):
    """Device d receives device (d-1)'s ``row``; the first device zeros."""
    n_dev = jax.lax.axis_size(axis)
    perm = [(d, d + 1) for d in range(n_dev - 1)]
    return jax.lax.ppermute(row, axis, perm)


def _shift_cols(x, shift):
    """Zero-fill column shift (the local axis): shift=-1 -> x[:, j+1]."""
    if shift == -1:
        return jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    return jnp.pad(x[:, :-1], ((0, 0), (1, 0)))


def _local_matvec(consts, masks, slabs, axis):
    """One uniform stencil application on local canvas row-strips.

    ``slabs`` is (3, r, n) — the H, V, D canvas strips. Axis-0 stencil
    offsets become halo rows (2 ppermutes); axis-1 offsets are local
    column shifts; the per-family interior rectangle masks (global row
    indices baked in by the caller) zero Dirichlet rows, canvas padding
    and halo wrap-ins exactly like the fused kernel's rect masks.
    """
    xH, xV, xD = slabs[0], slabs[1], slabs[2]
    (cHH, cHVu, cHDu, cHVd, cHDd,
     cVV, cVDl, cVHl, cVHr, cVDr,
     cDD, cDVr, cDHd, cDHu, cDVl) = consts
    mH, mV, mD = masks

    # From below (row j-1 of V and D), one ppermute for both rows.
    below = _halo_from_below(jnp.stack([xV[-1], xD[-1]]), axis)
    vd_lo, dd_lo = below[0], below[1]
    # From above (row j+1 of H).
    h_hi = _halo_from_above(xH[:1], axis)

    xV_down = jnp.concatenate([vd_lo[None, :], xV[:-1]], axis=0)
    xD_down = jnp.concatenate([dd_lo[None, :], xD[:-1]], axis=0)
    xH_up = jnp.concatenate([xH[1:], h_hi], axis=0)

    yH = mH * (cHH * xH
               + cHVu * _shift_cols(xV, -1)
               + cHDu * xD
               + cHVd * xV_down
               + cHDd * xD_down)
    yV = mV * (cVV * xV
               + cVDl * _shift_cols(xD, 1)
               + cVHl * _shift_cols(xH, 1)
               + cVHr * xH_up
               + cVDr * xD)
    yD = mD * (cDD * xD
               + cDVr * _shift_cols(xV, -1)
               + cDHd * xH
               + cDHu * xH_up
               + cDVl * xV)
    return jnp.stack([yH, yV, yD])


def _family_masks(n, c, r_loc, row0, dtype):
    """Interior rectangle masks for a local strip of canvas rows.

    Global coordinates (UniformSpec.interior_rects): H rows [1, c) x cols
    [0, c); V rows [0, c) x cols [1, c); D rows [0, c) x cols [0, c).
    """
    rows = row0 + jnp.arange(r_loc)[:, None]
    cols = jnp.arange(n)[None, :]

    def rect(r0, r1, c0, c1):
        return (((rows >= r0) & (rows < r1)) &
                ((cols >= c0) & (cols < c1))).astype(dtype)

    return rect(1, c, 0, c), rect(0, c, 1, c), rect(0, c, 0, c)


def build_halo_solver(mesh: Mesh, mesh_data, problem, dt, *, order=1,
                      iters=8, axis="mp", extrapolate=False,
                      snapshot_every=None, solver_method="chebyshev",
                      tol=1e-8, maxiter=200,
                      source_quadrature="mass_lumped"):
    """Jitted halo-exchange solve over a structured mesh.

    Returns ``solve(ops, u0)`` producing ``(1, n_seg)`` (final state), or
    — with ``snapshot_every=k`` — the strided trajectory
    ``((nt-1)/k + 1, n_seg)`` including the initial state, matching the
    serial scan path's ``solutions[::k]`` (run_time_loop semantics:
    snapshots carry the boundary lift, row 0 is ``u0`` as given).

    Source terms are supported: midpoint-coordinate canvases are sharded
    alongside the state and the lumped-mass load ``dt * m * s`` is added
    per step (``source_quadrature="mass_lumped"``, the corrected-D10
    default of models/crbe.run_time_loop — BE samples t^{n+1}, CN the
    trapezoid average; ``"reference"`` reproduces the reference's raw
    pointwise add, crbe.py:391-394).

    ``solver_method="bicgstab"`` runs linalg.bicgstab with psum-reduced
    dot/norm (4 scalar psums per iteration, residual early exit);
    ``"chebyshev"`` (default) keeps the inner loop collective-free.

    The entire nt-1 step loop runs inside one ``shard_map``; per matvec
    the only communication is two 1-row ppermutes.
    """
    from airpollution_tpu.models.crbe import reject_obstacles, reject_robin

    reject_robin(problem, "the halo-exchange solver")
    reject_obstacles(problem, "the halo-exchange solver")
    md = mesh_data
    if getattr(md, "structured_n", None) is None:
        raise ValueError("halo solver requires a structured mesh")
    if getattr(problem, "variable_coefficients", False):
        raise ValueError(
            "the halo solver runs on the translation-invariant uniform "
            "operator; spatially varying coefficients need the serial "
            "stencil/canvas paths (CRBESolver matvec_impl='stencil') or "
            "the row-sharded ELL solver (parallel/fem_shard.py)"
        )
    if solver_method not in ("chebyshev", "bicgstab"):
        raise ValueError(f"unknown solver_method {solver_method!r}")
    has_source = not getattr(problem, "zero_source", False)
    if source_quadrature not in ("mass_lumped", "reference"):
        raise ValueError(
            f"unknown source_quadrature {source_quadrature!r}"
        )
    pattern = stencil_mod.get_pattern(md)
    spec = uniform_mod.build_uniform_spec(pattern)
    n, c = spec.n, spec.c
    n_dev = mesh.shape[axis]
    r_loc = -(-n // n_dev)
    n_rows = r_loc * n_dev
    perm = jnp.asarray(pattern.perm)
    inv = jnp.asarray(pattern.inv_perm)
    n_steps = md.nt - 1
    if snapshot_every is not None and (
        snapshot_every < 1 or n_steps % snapshot_every
    ):
        raise ValueError("snapshot_every must be a positive divisor "
                         "of nt-1")

    def _pad_rows(can3):
        return jnp.pad(can3, ((0, 0), (0, n_rows - n), (0, 0)))

    def solve_impl(ops: GlobalOperators, u0, aux, bounds):
        # aux threads the O(N) per-mesh arrays through jit as ARGUMENTS —
        # closure constants become compile payload, which broke the
        # remote-compile transport at 4097² (models/crbe.py _solve_aux).
        perm, inv, midpoints, boundary_mask = aux
        consts = uniform_mod.extract_constants(spec, ops.system.vals)
        mass_c = uniform_mod.family_constants(spec, ops.mass_diag)
        idiag_c = 1.0 / uniform_mod.family_constants(spec, ops.system_diag)
        if solver_method == "chebyshev":
            lo, hi = bounds
            theta = 0.5 * (hi + lo)
            delta = 0.5 * (hi - lo)
            sigma = theta / delta

        u0_can = _pad_rows(jnp.stack(to_canvases(spec, u0[perm])))
        # Midpoint coordinates in canvas layout, sharded like the state
        # (only read when the problem has a source term; the pair costs
        # two state-sized arrays).
        mid = jnp.asarray(midpoints, u0.dtype)
        x_can = _pad_rows(jnp.stack(to_canvases(spec, mid[perm, 0])))
        y_can = _pad_rows(jnp.stack(to_canvases(spec, mid[perm, 1])))

        def device_solve(u0_loc, x_loc, y_loc):
            dev = jax.lax.axis_index(axis)
            row0 = dev * r_loc
            masks = _family_masks(n, c, r_loc, row0, u0_loc.dtype)
            mv = partial(_local_matvec, consts, masks, axis=axis)
            mass3 = mass_c[:, None, None]
            id3 = idiag_c[:, None, None]
            mask3 = jnp.stack(masks)

            def chebyshev_solve(r, x):
                d = (id3 / theta) * r

                def body(_, state):
                    x, r, d, rho = state
                    x = x + d
                    r = r - mv(d)
                    rho_new = 1.0 / (2.0 * sigma - rho)
                    d = (rho_new * rho) * d + (
                        2.0 * rho_new / delta
                    ) * (id3 * r)
                    return (x, r, d, rho_new)

                x, r, d, _ = jax.lax.fori_loop(
                    0, iters, body, (x, r, d, 1.0 / sigma)
                )
                return x

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b), axis)

            def pnorm(v):
                return jnp.sqrt(pdot(v, v))

            def step(carry, t):
                u, up = carry
                # RHS in the Krylov-invariant (no identity rows) form of
                # the fused kernel: BE b = m*mask(u); CN adds the
                # row-masked -(dt/2)(K+A)u via b = 2 m mask(u) - mask(S u)
                # (ops/pallas_solver.py docstring identity).
                if order == 2:
                    b = 2.0 * mass3 * (mask3 * u) - mv(u)
                else:
                    b = mass3 * (mask3 * u)
                if has_source:
                    def s_at(tt):
                        xyt = jnp.stack(
                            [x_loc, y_loc, jnp.full_like(x_loc, tt)],
                            axis=-1,
                        )
                        return problem.source_term(xyt)

                    if source_quadrature == "reference":
                        b = b + dt * mask3 * s_at(t)
                    else:
                        # Lumped-mass load (corrected D10): BE samples
                        # t^{n+1}, CN the t^n / t^{n+1} trapezoid —
                        # matches run_time_loop's mass_lumped branch.
                        s = s_at(t) if order == 1 \
                            else 0.5 * (s_at(t) + s_at(t - dt))
                        b = b + dt * mass3 * (mask3 * s)
                guess = (2.0 * u - up) if extrapolate else u
                x0 = mask3 * guess
                if solver_method == "chebyshev":
                    r0 = b - mv(x0)
                    u_new = chebyshev_solve(r0, x0)
                else:
                    u_new = linalg.bicgstab(
                        mv, b, x0=x0, tol=tol, maxiter=maxiter,
                        precond=lambda v: id3 * v, dot=pdot, norm=pnorm,
                    ).x
                return (u_new, u), None

            ts = dt * jnp.arange(1, n_steps + 1, dtype=u0_loc.dtype)
            if snapshot_every is None:
                (u_fin, _), _ = jax.lax.scan(step, (u0_loc, u0_loc), ts)
                return u_fin

            def chunk(carry, ts_chunk):
                carry, _ = jax.lax.scan(step, carry, ts_chunk)
                return carry, carry[0]

            _, snaps = jax.lax.scan(
                chunk, (u0_loc, u0_loc),
                ts.reshape(n_steps // snapshot_every, snapshot_every),
            )
            return snaps  # (n_snap, 3, r_loc, n)

        out_spec = (P(None, axis, None) if snapshot_every is None
                    else P(None, None, axis, None))
        fn = jax.shard_map(
            device_solve, mesh=mesh,
            in_specs=(P(None, axis, None),) * 3,
            out_specs=out_spec,
        )

        # Boundary lift (replicated, outside shard_map) + trajectory
        # assembly shared with the serial and stripe solvers
        # (ops/lifting.py).
        lift_at = lifting.make_lift(problem, midpoints, boundary_mask)

        if snapshot_every is None:
            u_can = fn(u0_can, x_can, y_can)[:, :n, :]
            u_fam = from_canvases(spec, u_can[0], u_can[1], u_can[2])
            return lifting.lifted_final_state(lift_at, u_fam[inv], dt,
                                              n_steps)

        snaps_can = fn(u0_can, x_can, y_can)[:, :, :n, :]
        u_fams = jax.vmap(
            lambda can: from_canvases(spec, can[0], can[1], can[2])
        )(snaps_can)
        return lifting.strided_trajectory(
            lift_at, u0, u_fams[:, inv], dt, snapshot_every, n_steps
        )

    jitted = jax.jit(solve_impl)
    aux = (perm, inv, jnp.asarray(md.midpoints),
           jnp.asarray(md.boundary_mask))

    @jax.jit
    def _bounds_fn(ops: GlobalOperators, u0, perm):
        # Chebyshev interval, computed EAGERLY once per operator set and
        # fed to the solve as an argument — tracing power_bounds inside
        # the jitted solve re-runs its ~100 matvecs every invocation
        # (the serial path and hbm_shard cache these the same way). perm
        # is an argument: an O(N) closure constant is compile payload.
        consts = uniform_mod.extract_constants(spec, ops.system.vals)
        sys_matvec = partial(uniform_mod.uniform_matvec, spec, consts)
        return linalg.power_bounds(
            sys_matvec, jnp.zeros_like(u0),
            scale=1.0 / jnp.sqrt(ops.system_diag[perm]),
        )

    cache = {"ops": None, "bounds": None}

    def solve(ops: GlobalOperators, u0):
        if solver_method == "chebyshev" and cache["ops"] is not ops:
            cache["ops"] = ops
            cache["bounds"] = _bounds_fn(ops, u0, perm)
        bounds = (cache["bounds"] if cache["bounds"] is not None
                  else (jnp.zeros((), u0.dtype),) * 2)
        return jitted(ops, u0, aux, bounds)

    return solve
