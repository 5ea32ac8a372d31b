"""Problem 3 per-mesh CRBE-vs-PINN comparison table.

Counterpart of scripts/problem3_comparative_analysis.py: for each mesh size
[4..128], time/memory the CRBE solve and a PINN training (layers
[3, n]*3, lambda=(1,8,1), IC/BC fractions 0.25/0.15 —
problem3_comparative_analysis.py:41-42, :103-107), then record the
PINN-vs-CRBE discrepancy at t=T. Writes
``problem3_analysis_results/problem3_comparative_analysis_by_mesh_size.csv``
with the reference's columns (:91-94, :144-147, :156).

Fixes over the reference (defect D4): the reference crashes as-is —
``epochs_list`` is used but its definition is commented out (:39, :111) and
line :156 is a syntax error (``update({...)``). Here the commented-out
epoch schedule is restored as the default.

Run: ``python -m scripts.problem3_comparative_analysis [--epochs N]``.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import pandas as pd
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.models.pinn import PINN
from airpollution_tpu.problems import SquarePulseProblem as Problem
from airpollution_tpu.utils import memory_delta

from experiments import common

LR_LIST = [1e-3, 1e-3, 1e-3, 1e-4, 2e-4, 3e-4]  # :41
EPOCHS_LIST = [500, 1000, 2000, 4000, 8000, 16000]  # restored from :39
LAMBDA_WEIGHTS = {"pde": 1.0, "ic": 8.0, "bc": 1.0}  # :42


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Problem 3 comparative analysis by mesh size."
    )
    parser.add_argument("--epochs", type=int, default=0,
                        help="Override the per-mesh epoch schedule")
    parser.add_argument("--mesh_sizes", type=int, nargs="*",
                        default=common.MESH_SIZES)
    args = parser.parse_args(argv)

    unknown = set(args.mesh_sizes) - set(common.MESH_SIZES)
    if unknown:
        raise SystemExit(
            f"--mesh_sizes {sorted(unknown)} not in the schedule "
            f"{common.MESH_SIZES} (hyperparameters are per-size)"
        )
    np.random.seed(common.SEED)
    common.print_device()
    print("Starting comparative analysis for Problem 3...")

    exp_dir = "problem3_analysis_results"
    os.makedirs(exp_dir, exist_ok=True)

    problem = Problem()
    domain = apt.Domain()
    n_steps = 128

    epochs_list = (EPOCHS_LIST if not args.epochs
                   else [args.epochs] * len(common.MESH_SIZES))

    results_data = []
    for i, m_size in enumerate(common.MESH_SIZES):
        if m_size not in args.mesh_sizes:
            continue
        print(f"\n--- Processing Mesh Size: {m_size} ---")
        current = {"m_size": m_size}

        mesh = apt.create_mesh(m_size, domain_size=20.0)
        mesh_data = apt.MeshData(mesh, domain, nt=n_steps)

        # CRBE
        crbe_solver = CRBESolver(domain, problem, mesh_data,
                                 stiffness_convention="reference")
        with memory_delta() as mem:
            start = time.time()
            crbe_solver.solve()
            crbe_time = time.time() - start
        u_crbe_final = np.asarray(crbe_solver.solutions[-1, :]).copy()
        current.update({
            "crbe_time_solve_s": crbe_time,
            "crbe_cpu_mem_diff_MB": mem["cpu_memory_usage_MB"],
            "crbe_gpu_mem_peak_MB": mem["gpu_memory_usage_MB"],
        })
        print(f"CRBE solve (m_size={m_size}): {crbe_time:.2f}s")

        # PINN
        layers = [3] + [common.N_NEURONS[i]] * 3 + [1]
        n_col = int(round(mesh_data.number_of_segments / 1.4))
        batch_sizes = {
            "pde": n_col,
            "ic": int(round(0.25 * n_col)),
            "bc": int(round(0.15 * n_col)),
        }
        model = PINN(layers, problem, domain, seed=common.SEED)
        with memory_delta() as mem:
            start = time.time()
            history = model.train(
                batch_sizes, epochs_list[i], LR_LIST[i], LAMBDA_WEIGHTS,
                early_stopping_patience=500,
                early_stopping_min_delta=1e-6,
                restore_best_weights=True,
            )
            pinn_time = time.time() - start
        current.update({
            "pinn_time_train_s": pinn_time,
            "pinn_cpu_mem_diff_MB": mem["cpu_memory_usage_MB"],
            "pinn_gpu_mem_peak_MB": mem["gpu_memory_usage_MB"],
            "pinn_epochs_run": len(history["pde_loss"]),
        })
        print(f"PINN training (m_size={m_size}): {pinn_time:.2f}s "
              f"({len(history['pde_loss'])} epochs)")

        # Cross-method discrepancy at t=T.
        t_col = jnp.full((mesh_data.number_of_segments, 1), domain.T,
                         mesh_data.midpoints.dtype)
        xyt = jnp.concatenate([mesh_data.midpoints, t_col], axis=1)
        u_pinn_final = np.asarray(model.forward(xyt)).ravel()
        diff = np.abs(u_pinn_final - u_crbe_final)
        current.update({
            "l2_error_diff": float(np.linalg.norm(diff)),
            "max_error_diff": float(np.max(diff)),
        })
        print(f"Error (m_size={m_size}): L2 Diff = "
              f"{current['l2_error_diff']:.4e}, "
              f"Max Diff = {current['max_error_diff']:.4e}")
        results_data.append(current)

    df = pd.DataFrame(results_data)
    out = os.path.join(exp_dir,
                       "problem3_comparative_analysis_by_mesh_size.csv")
    df.to_csv(out, index=False)
    print(f"\nResults saved to {out}")
    print(df)
    print("\nComparative analysis script finished.")
    return df


if __name__ == "__main__":
    main()
