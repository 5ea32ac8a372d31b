"""Fixed-runtime CRBE-vs-PINN comparison (parity with
experiments/fixed_runtime_experiments.py).

For each mesh size [4..64] and time budget [30, 60, 120, 180] s (or [10] s
with --run_for_testing): train the PINN in epoch chunks until the budget is
spent, then run CRBE once (warning if over budget,
fixed_runtime_experiments.py:146-147). Writes
``experimental_results/fixed_runtime/fixed_runtime_comparison.csv`` (schema
:110-122, :154-166) and the grouped ``fixed_runtime_summary_stats.csv``
(:228-234).

Divergence from the reference, documented: the reference's budget loop calls
``model.train(epochs=1)`` per iteration, re-creating Adam and the LR
scheduler every epoch so moment estimates never accumulate (defect D6).
Here the default continues optimizer state across chunks
(``--warm_start=True``); pass ``--warm_start=False`` for the reference's
cold-restart behavior. Chunk size is ``--epochs_per_chunk`` (default 50;
the scan-based trainer makes per-single-epoch chunking pure overhead).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import pandas as pd

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.models.pinn import PINN, count_parameters
from airpollution_tpu.utils import memory_delta

from experiments import common

BASE_NEURONS = [2, 4, 8, 16, 32]  # fixed_runtime_experiments.py:57
FR_MESH_SIZES = [4, 8, 16, 32, 64]  # :50


def run_pinn_with_time_budget(domain, problem, mesh_data, time_budget,
                              n_neurons, lr, warm_start, epochs_per_chunk):
    layers = [3] + [n_neurons] * 4 + [1]
    batch_sizes = common.collocation_budget(mesh_data.number_of_segments)
    model = PINN(layers, problem, domain, seed=common.SEED)

    print(f"PINN training with {time_budget}s budget...")
    start_time = time.time()
    epoch = 0
    with memory_delta() as mem:
        first = True
        while (time.time() - start_time) < time_budget:
            model.train(
                batch_sizes, epochs=epochs_per_chunk, lr=lr,
                lambda_weights=common.LAMBDA_WEIGHTS,
                warm_start=warm_start and not first,
            )
            first = False
            epoch += epochs_per_chunk
            if epoch % 1000 < epochs_per_chunk:
                elapsed = time.time() - start_time
                print(f"  Epoch {epoch}, Elapsed: {elapsed:.1f}s, "
                      f"Loss: {model.history['total_loss'][-1]:.6f}")
    history = model.history
    actual_runtime = time.time() - start_time

    rel_l2_error, l2_error, max_error = model.compute_errors(
        mesh_data, problem.analytical_solution
    )
    return {
        "method": "PINN",
        "actual_runtime": actual_runtime,
        "epochs_completed": epoch,
        "final_loss": history["total_loss"][-1] if history["total_loss"]
        else float("inf"),
        "rel_l2_error": rel_l2_error,
        "l2_error": l2_error,
        "max_error": max_error,
        "n_parameters": count_parameters(layers),
        "gpu_memory_usage_MB": mem["gpu_memory_usage_MB"],
        "cpu_memory_usage_MB": mem["cpu_memory_usage_MB"],
        "convergence_history": history["total_loss"],
    }


def run_crbe_with_time_budget(domain, problem, mesh_data, time_budget):
    print("CRBE solving...")
    start_time = time.time()
    with memory_delta() as mem:
        solver = CRBESolver(domain, problem, mesh_data,
                            stiffness_convention="reference")
        solver.solve()
    actual_runtime = time.time() - start_time
    if actual_runtime > time_budget:
        print(f"  Warning: CRBE took {actual_runtime:.1f}s, exceeding "
              f"budget of {time_budget}s")
    rel_l2_error, l2_error, max_error = solver.compute_errors(
        problem.analytical_solution
    )
    return {
        "method": "CRBE",
        "actual_runtime": actual_runtime,
        "epochs_completed": 1,
        "final_loss": None,
        "rel_l2_error": rel_l2_error,
        "l2_error": l2_error,
        "max_error": max_error,
        "n_parameters": mesh_data.number_of_segments,
        "gpu_memory_usage_MB": mem["gpu_memory_usage_MB"],
        "cpu_memory_usage_MB": mem["cpu_memory_usage_MB"],
        "convergence_history": None,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Fixed-runtime CRBE vs PINN comparison."
    )
    parser.add_argument("--run_for_testing", type=common.str2bool,
                        default=False)
    parser.add_argument("--warm_start", type=common.str2bool, default=True,
                        help="Continue Adam state across chunks (D6 fix); "
                             "False reproduces the reference's restarts")
    parser.add_argument("--epochs_per_chunk", type=int, default=50)
    args = parser.parse_args(argv)

    np.random.seed(common.SEED)
    common.print_device()

    save_dir = "experimental_results/fixed_runtime"
    os.makedirs(save_dir, exist_ok=True)

    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    time_budgets = [30, 60, 120, 180] if not args.run_for_testing else [10]

    all_results = []
    for mesh_idx, mesh_size in enumerate(FR_MESH_SIZES):
        print(f"\n{'=' * 50}\nMESH SIZE: {mesh_size}\n{'=' * 50}")
        mesh = apt.create_mesh(mesh_size, domain_size=common.DOMAIN_SIZE)
        mesh_data = apt.MeshData(mesh, domain, nt=common.N_STEPS)
        n_neurons = BASE_NEURONS[mesh_idx]
        lr = common.LR_LIST[mesh_idx]

        for time_budget in time_budgets:
            print(f"\nTime Budget: {time_budget}s\n" + "-" * 30)
            meta = {
                "mesh_size": mesh_size,
                "time_budget": time_budget,
                "n_dofs": mesh_data.number_of_segments,
                "n_boundary_dofs": len(
                    np.asarray(mesh_data.boundary_segments)
                ),
            }
            pinn_result = run_pinn_with_time_budget(
                domain, problem, mesh_data, time_budget, n_neurons, lr,
                args.warm_start, args.epochs_per_chunk,
            )
            pinn_result.update(meta)
            all_results.append(pinn_result)

            crbe_result = run_crbe_with_time_budget(
                domain, problem, mesh_data, time_budget
            )
            crbe_result.update(meta)
            all_results.append(crbe_result)

            print(f"PINN  - Runtime: {pinn_result['actual_runtime']:.1f}s, "
                  f"Epochs: {pinn_result['epochs_completed']}, "
                  f"Rel L2 Error: {pinn_result['rel_l2_error']:.6f}")
            print(f"CRBE  - Runtime: {crbe_result['actual_runtime']:.1f}s, "
                  f"Rel L2 Error: {crbe_result['rel_l2_error']:.6f}")

    df_results = pd.DataFrame(all_results)
    df_results.to_csv(f"{save_dir}/fixed_runtime_comparison.csv", index=False)

    print(f"\n{'=' * 50}\nEXPERIMENT COMPLETED\n{'=' * 50}")
    print(f"Results saved to: {save_dir}/fixed_runtime_comparison.csv")
    print(f"Total experiments: {len(all_results)}")

    summary_stats = df_results.groupby(["method", "time_budget"]).agg({
        "rel_l2_error": ["mean", "std"],
        "actual_runtime": ["mean", "std"],
        "epochs_completed": "mean",
    }).round(6)
    summary_stats.to_csv(f"{save_dir}/fixed_runtime_summary_stats.csv")
    print("\nSUMMARY:")
    print(summary_stats)
    print("\nExperiment completed successfully!")
    return df_results


if __name__ == "__main__":
    main()
