"""CRBE h-refinement sweep (parity with experiments/crbe_experiments.py).

Runs the CR FEM solver over mesh sizes [4, 8, 16, 32, 64, 128] with nt=128
on the default Gaussian problem, records errors/time/memory and writes
``experimental_results/crbe/df_crbe_training_results.csv`` with the
reference's exact column schema (crbe_experiments.py:71-83, :93-94), so the
downstream table/figure generators run unchanged.

Extra flags over the reference: --stiffness_convention (reference|correct,
default reference for table parity) and --dtype.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import pandas as pd

import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver, ElementCR
from airpollution_tpu.utils import memory_delta, profiler_trace

from experiments import common


def main(argv=None):
    parser = argparse.ArgumentParser(description="CRBE mesh-refinement sweep.")
    parser.add_argument("--mesh_sizes", type=int, nargs="*",
                        default=common.MESH_SIZES)
    parser.add_argument("--n_steps", type=int, default=common.N_STEPS)
    parser.add_argument("--stiffness_convention", type=str,
                        default="reference", choices=["reference", "correct"])
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "float64"])
    parser.add_argument("--time_scheme_order", type=int, default=1)
    parser.add_argument("--profile_dir", type=str, default="",
                        help="Write a jax.profiler trace of the solves here")
    parser.add_argument("--mesh_kind", type=str, default="structured",
                        choices=["structured", "unstructured"],
                        help="unstructured = jittered-Delaunay meshes (the "
                             "reference's gmsh mesh family, crbe.py:14-44); "
                             "results go to a _unstructured-suffixed CSV")
    args = parser.parse_args(argv)

    np.random.seed(common.SEED)
    if args.dtype == "float64":
        # jnp silently downcasts f64 requests unless x64 is enabled.
        import jax

        jax.config.update("jax_enable_x64", True)
    common.print_device()

    exp_dir = "experimental_results/crbe"
    os.makedirs(exp_dir, exist_ok=True)

    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    cr_element = ElementCR()

    crbe_results = []
    for mesh_size in args.mesh_sizes:
        print(f"Training for mesh size = {mesh_size} ...")
        start_time = time.time()

        if args.mesh_kind == "unstructured":
            from airpollution_tpu.mesh.structured import (
                create_unstructured_mesh,
            )

            mesh = create_unstructured_mesh(
                mesh_size, domain_size=common.DOMAIN_SIZE, seed=common.SEED
            )
        else:
            mesh = apt.create_mesh(mesh_size, domain_size=common.DOMAIN_SIZE)
        mesh_data = apt.MeshData(mesh, domain, nt=args.n_steps, dtype=dtype)
        solver = CRBESolver(
            domain, problem, mesh_data, cr_element,
            time_scheme_order=args.time_scheme_order,
            stiffness_convention=args.stiffness_convention,
        )

        with memory_delta() as mem, profiler_trace(args.profile_dir or None):
            solver.solve()
        train_time = time.time() - start_time
        # Perf columns come from a warm second solve — the first includes
        # jit compilation (CLAUDE.md benchmarking rule); train_time keeps
        # the reference's everything-included semantics.
        solver.solve()

        rel_l2_error, l2_error, max_error = solver.compute_errors(
            problem.analytical_solution
        )
        solver.plot_interpolated_solution(
            analytical_sol_fn=problem.analytical_solution, save_dir=exp_dir,
            name=f"ms{mesh_size}_crbe",
        )

        crbe_results.append({
            "mesh_size": mesh_size,
            "n_dofs": mesh_data.number_of_segments,
            "n_boundary_dofs": len(np.asarray(mesh_data.boundary_segments)),
            "l2_error": l2_error,
            "rel_l2_error": rel_l2_error,
            "max_error": max_error,
            "train_time": train_time,
            "gpu_memory_usage_MB": mem["gpu_memory_usage_MB"],
            "cpu_memory_usage_MB": mem["cpu_memory_usage_MB"],
            "number_of_collocation_points": mesh_data.number_of_segments,
            # TPU-native extras (appended columns; schema superset).
            "solve_time": solver.solve_time,
            "steps_per_sec": (args.n_steps - 1) / solver.solve_time,
        })

        print(f"Mesh size: {mesh_size}")
        print(f"CPU Memory Used: {mem['cpu_memory_usage_MB']:.2f} MB")
        print("-" * 40)

    df_crbe = pd.DataFrame(crbe_results)
    suffix = "_unstructured" if args.mesh_kind == "unstructured" else ""
    if args.time_scheme_order == 2:
        suffix += "_cn"
    df_crbe.to_csv(f"{exp_dir}/df_crbe_training_results{suffix}.csv")
    print(df_crbe)
    if len(df_crbe) > 1:
        # Empirical convergence rates, the reference's convention
        # (utils/data_visualization.py:62-82: guide lines (ms/4)^-rate
        # against rel_l2_error / max_error, i.e. h ~ 1/ms): slope of
        # log error vs log h. Reference empirical values on its gmsh
        # meshes: O(h^1.37) L2, O(h^0.98) Linf.
        h = np.log(1.0 / df_crbe["mesh_size"].to_numpy())
        for col, label in (("rel_l2_error", "L2"), ("max_error", "Linf")):
            rate = np.polyfit(h, np.log(df_crbe[col].to_numpy()), 1)[0]
            print(f"empirical {label} convergence rate: O(h^{rate:.2f})")
    return df_crbe


if __name__ == "__main__":
    main()
