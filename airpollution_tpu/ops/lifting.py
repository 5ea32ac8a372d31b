"""Dirichlet boundary lift and strided-trajectory assembly.

The solvers iterate on the HOMOGENEOUS state (zero on Dirichlet rows —
the D7 lifting semantics, reference crbe.py:364-433) and add the
boundary values back when materializing output. Three engines share the
exact contract — the serial fused/scan solver (models/crbe.py), the
halo-exchange scan solver (parallel/stencil_shard.py) and the
distributed stripe kernel (parallel/hbm_shard.py) — so the lift and the
"u0 row + lifted snapshots at t = dt*k*(1..n)" assembly live here once;
a convention change in any copy would silently desynchronize serial and
sharded trajectories.

``midpoints`` / ``boundary_mask`` are passed as ARRAYS (not read off a
MeshData) so callers can thread them through jit as arguments instead of
closure constants (compile-payload rule, models/crbe.py _solve_aux).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_lift(problem, midpoints, boundary_mask, zero_mask=None):
    """``lift_at(t)``: boundary values at time t on boundary DOFs, 0 inside.

    ``zero_mask``: DOFs held at zero REGARDLESS of ``boundary_fn`` —
    obstacle dead DOFs are identity rows pinned to 0, but their
    midpoints are interior plume coordinates where ``boundary_fn``
    (plume data) is nonzero (models/crbe.run_time_loop does the same)."""

    def lift_at(t):
        t_col = jnp.full((midpoints.shape[0], 1), t,
                         dtype=midpoints.dtype)
        xyt = jnp.concatenate([midpoints, t_col], axis=1)
        lift = jnp.where(boundary_mask, problem.boundary_fn(xyt), 0.0)
        if zero_mask is not None:
            lift = jnp.where(zero_mask, jnp.zeros((), lift.dtype), lift)
        return lift

    return lift_at


def lifted_final_state(lift_at, u_hom, dt, n_steps):
    """``(1, n_seg)`` final state: homogeneous solution + lift at T."""
    return (u_hom + lift_at(dt * n_steps))[None, :]


def strided_trajectory(lift_at, u0, u_homs, dt, snapshot_every, n_steps):
    """Reference-semantics strided trajectory: row 0 is the FULL initial
    condition (boundary values included, crbe.py:364), later rows are
    the homogeneous snapshots lifted at their times dt*k*(1..n_snap)."""
    times = dt * snapshot_every * jnp.arange(
        1, n_steps // snapshot_every + 1, dtype=u0.dtype
    )
    return jnp.concatenate(
        [u0[None, :], u_homs + jax.vmap(lift_at)(times)], axis=0
    )
