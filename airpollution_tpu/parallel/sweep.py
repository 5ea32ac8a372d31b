"""Vectorized / device-parallel parameter sweeps.

The reference runs its sensitivity and HPO sweeps as sequential host loops
(sensitivity_analysis.py:91-115, optimal_hyperparams_search.py:89 with
thread-level parallelism only). On TPU the natural form is: make the swept
physical parameter a *traced* argument, ``vmap`` the whole solve over it
(one compiled program, batched assembly + batched time loop), and optionally
``shard_map`` the vmapped batch across a 'trial' device axis so each chip
integrates a slice of the sweep — the direct analogue SURVEY.md section
2.5(c) calls for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from airpollution_tpu.models.crbe import assemble, run_time_loop
from airpollution_tpu.problems import Problem


def crbe_diffusion_sweep(
    mesh_data,
    domain,
    D_values,
    *,
    v=(1.0, 0.5),
    sigma=1.0,
    order=1,
    tol=1e-7,
    maxiter=200,
    stiffness_convention="reference",
    mesh: Mesh | None = None,
    axis: str = "trial",
):
    """Solve the CRBE problem for every D at once; returns per-D errors.

    The direct TPU counterpart of the sensitivity loop
    (sensitivity_analysis.py:91-115): ``vmap`` over the diffusion
    coefficient — D enters assembly (stiffness scaling) and the
    analytic IC/BC/solution, all traced. With ``mesh`` given, the D batch
    is sharded over the 'trial' axis via shard_map (padded to the axis
    size) so trials run device-parallel.

    Returns dict of arrays with keys rel_l2_error, l2_error, max_error
    (unweighted norms, crbe.py:447-453), each of shape (len(D_values),).
    """
    md = mesh_data
    dt = domain.T / (md.nt - 1)
    D_values = jnp.asarray(D_values, md.midpoints.dtype)

    def solve_one(D):
        problem = Problem(v=v, D=D, sigma=sigma)
        ops = assemble(md, problem, dt, order, stiffness_convention)
        u0 = jnp.asarray(
            problem.initial_condition_fn(md.midpoints), md.midpoints.dtype
        )
        sols, _ = run_time_loop(
            ops, u0, mesh_data=md, problem=problem, dt=dt, order=order,
            tol=tol, maxiter=maxiter, store_solutions=False,
        )
        t_col = jnp.full((md.midpoints.shape[0], 1), domain.T,
                         md.midpoints.dtype)
        xyt = jnp.concatenate([md.midpoints, t_col], axis=1)
        u_T = sols[0]  # final-state output arrives boundary-lifted
        u_exact = jnp.asarray(problem.analytical_solution(xyt),
                              md.midpoints.dtype)
        err = jnp.abs(u_exact - u_T)
        l2 = jnp.sqrt(jnp.sum(err**2))
        return {
            "rel_l2_error": l2 / jnp.sqrt(jnp.sum(u_exact**2)),
            "l2_error": l2,
            "max_error": jnp.max(err),
        }

    if mesh is None:
        return jax.jit(jax.vmap(solve_one))(D_values)

    n_dev = mesh.shape[axis]
    n = D_values.shape[0]
    n_pad = (-n) % n_dev
    D_padded = jnp.concatenate(
        [D_values, jnp.full((n_pad,), D_values[-1], D_values.dtype)]
    ) if n_pad else D_values

    fn = jax.shard_map(
        jax.vmap(solve_one), mesh=mesh,
        in_specs=P(axis), out_specs=P(axis), check_vma=False,
    )
    out = jax.jit(fn)(D_padded)
    return jax.tree.map(lambda a: a[:n], out)
