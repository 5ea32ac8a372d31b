"""Row-sharded CRBE solve: the FEM operator distributed over a device mesh.

The reference's solver is single-process scipy (SURVEY.md section 2.5). The
TPU-native scale-out for meshes too large for one chip: shard the ELL
operator's *rows* across an 'mp' axis; vectors stay replicated. Each device
computes its row block of ``A @ x`` and an ``all_gather`` over ICI reforms
the full vector, so BiCGStab's scalar recurrences run bit-identically on
every device (psum-free dot products on replicated vectors). The entire
time loop (``lax.scan`` + inner BiCGStab) runs inside one ``shard_map``.

Scope: this is the GENERAL-mesh tier — correct for any ELL operator
(unstructured meshes included) but the all_gather moves the full O(N)
vector per matvec per device, so it is memory-relief, not weak scaling.
On structured meshes use the halo-exchange tiers instead:
``stencil_shard.build_halo_solver`` (two 1-row ppermutes per matvec) or
``hbm_shard.build_hbm_halo_solver`` (two halo-SLAB ppermutes per whole
step, the fused stripe kernel on-device) — both O(halo·n) communication.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from airpollution_tpu.models.crbe import GlobalOperators, run_time_loop
from airpollution_tpu.ops import sparse


def _pad_rows(arr, n_pad, fill=0):
    if n_pad == 0:
        return arr
    pad_width = [(0, n_pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad_width, constant_values=fill)


def pad_operators(ops: GlobalOperators, n_seg: int, n_devices: int):
    """Pad operator rows to a multiple of the mesh size.

    Padded rows are identity rows decoupled from the system (value 1 on a
    self-referencing column-0 slot would corrupt row 0's gather, so padded
    rows get all-zero values except a diagonal of 1 placed via the Jacobi
    diagonal only): matvec on padded rows returns 0, RHS entries are 0, and
    BiCGStab leaves them at 0.
    """
    n_pad_total = (-n_seg) % n_devices
    if n_pad_total == 0:
        return ops, 0
    system = sparse.EllMatrix(
        vals=_pad_rows(ops.system.vals, n_pad_total, 0.0),
        cols=_pad_rows(ops.system.cols, n_pad_total, 0),
    )
    ka = sparse.EllMatrix(
        vals=_pad_rows(ops.ka.vals, n_pad_total, 0.0),
        cols=_pad_rows(ops.ka.cols, n_pad_total, 0),
    )
    padded = GlobalOperators(
        mass_diag=_pad_rows(ops.mass_diag, n_pad_total, 0.0),
        stiffness=ops.stiffness,
        advection=ops.advection,
        ka=ka,
        system=system,
        system_diag=_pad_rows(ops.system_diag, n_pad_total, 1.0),
    )
    return padded, n_pad_total


def sharded_matvec(vals_local, cols_local, x, axis="mp"):
    """Row-block SpMV + all_gather: every device ends with the full y."""
    y_local = jnp.sum(vals_local * x[cols_local], axis=1)
    return jax.lax.all_gather(y_local, axis, tiled=True)


def build_sharded_solver(mesh: Mesh, mesh_data, problem, dt, *,
                         order=1, tol=1e-7, maxiter=200, axis="mp",
                         store_solutions=False):
    """Build a jitted row-sharded solve: (ops, u0) -> solutions.

    ``ops`` rows are padded/sharded over ``axis``; ``u0`` and all vectors
    are replicated. Reuses the exact serial time loop (crbe.run_time_loop)
    with a collective matvec — the numerics are identical to single-chip.
    """
    from airpollution_tpu.models.crbe import reject_obstacles, reject_robin

    reject_robin(problem, "the row-sharded solver")
    reject_obstacles(problem, "the row-sharded solver")
    n_devices = mesh.shape[axis]
    n_seg = mesh_data.number_of_segments

    class _PaddedMeshData:
        """Light view of mesh_data with row-padded vectors (midpoints and
        masks are only used for RHS/lift, which stay at true size)."""

        def __init__(self, md, n_pad):
            self.midpoints = md.midpoints
            self.boundary_mask = jnp.concatenate(
                [md.boundary_mask, jnp.ones(n_pad, bool)]
            ) if n_pad else md.boundary_mask
            self.nt = md.nt

    def solve(ops: GlobalOperators, u0):
        n_pad = ops.system.vals.shape[0] - n_seg
        md_view = _PaddedMeshData(mesh_data, n_pad)

        class _ProblemView:
            v = problem.v
            D = problem.D

            @staticmethod
            def source_term(xyt):
                s = problem.source_term(xyt[:n_seg])
                return jnp.concatenate([s, jnp.zeros(n_pad, s.dtype)]) \
                    if n_pad else s

            @staticmethod
            def boundary_fn(xyt):
                b = problem.boundary_fn(xyt[:n_seg])
                return jnp.concatenate([b, jnp.zeros(n_pad, b.dtype)]) \
                    if n_pad else b

        # Pad midpoints so xyt shapes line up inside the loop.
        if n_pad:
            md_view.midpoints = jnp.concatenate(
                [mesh_data.midpoints,
                 jnp.zeros((n_pad, 2), mesh_data.midpoints.dtype)]
            )
        u0p = jnp.concatenate([u0, jnp.zeros(n_pad, u0.dtype)]) \
            if n_pad else u0

        def device_solve(vals_local, cols_local, ops_rest, u0_rep):
            matvec = partial(sharded_matvec, vals_local, cols_local,
                             axis=axis)
            sols, _ = run_time_loop(
                ops_rest, u0_rep,
                mesh_data=md_view, problem=_ProblemView, dt=dt,
                order=order, tol=tol, maxiter=maxiter,
                store_solutions=store_solutions, matvec=matvec,
            )
            return sols

        ops_rest = ops._replace(
            system=sparse.EllMatrix(
                vals=jnp.zeros((1, 1), ops.system.vals.dtype),
                cols=jnp.zeros((1, 1), ops.system.cols.dtype),
            )
        )
        fn = jax.shard_map(
            device_solve,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None),
                      GlobalOperators(
                          mass_diag=P(), stiffness=sparse.EllMatrix(P(), P()),
                          advection=sparse.EllMatrix(P(), P()),
                          ka=sparse.EllMatrix(P(), P()),
                          system=sparse.EllMatrix(P(), P()),
                          system_diag=P(),
                      ),
                      P()),
            out_specs=P(),
            # check_vma=False: no AD crosses these collectives (the failure
            # mode that forces check_vma=True in pinn_parallel), and vma
            # tracking rejects the while_loop's replicated-but-gathered
            # carries; numerical equality with the serial path is covered
            # by tests/test_parallel.py.
            check_vma=False,
        )
        sols = fn(ops.system.vals, ops.system.cols, ops_rest, u0p)
        return sols[:, :n_seg]

    return jax.jit(solve)
