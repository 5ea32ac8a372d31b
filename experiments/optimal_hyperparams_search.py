"""PINN hyperparameter search (parity with
experiments/optimal_hyperparams_search.py).

Searches lr in [1e-4, 5e-1] (log), lambda_pde and lambda_ic_bc in [0.1, 10]
(log) for a width-32 depth-4 tanh PINN on the ms=64 mesh
(optimal_hyperparams_search.py:14, :39, :52-53, :61-63); the objective is
``(l2 - 1e-5)^2 + (max - 1e-5)^2`` (:81). Trials run through the in-repo
search engine (``airpollution_tpu.hpo``; optuna is used if importable),
thread-parallel like the reference's ``n_jobs=os.cpu_count()`` (:89).
Writes ``optuna_pinn_results_{width}.csv`` via the study's
``trials_dataframe()`` (:97-98).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import airpollution_tpu as apt
from airpollution_tpu.models.pinn import PINN

from experiments import common

try:  # pragma: no cover - optuna is absent in this environment
    import optuna as hpo_engine
except ImportError:
    from airpollution_tpu.hpo import search as hpo_engine

ACTIVATION = "tanh"
DEPTH = 4
MESH_SIZE = 64


def main(argv=None):
    parser = argparse.ArgumentParser(description="PINN experiment.")
    parser.add_argument("--width", type=int, default=32,
                        help="Neural network width")
    parser.add_argument("--n_trials", type=int, default=10)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--n_jobs", type=int, default=0,
                        help="0 = os.cpu_count() threads")
    parser.add_argument("--search_levers", type=common.str2bool,
                        default=False,
                        help="Also search the beyond-reference accuracy "
                             "levers (fourier_features, adaptive_oversample)")
    args = parser.parse_args(argv)

    np.random.seed(common.SEED)
    common.print_device()

    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    mesh = apt.create_mesh(MESH_SIZE, domain_size=common.DOMAIN_SIZE)
    mesh_data = apt.MeshData(mesh, domain, nt=common.N_STEPS)
    batch_sizes = common.collocation_budget(mesh_data.number_of_segments)

    def objective(trial):
        lr = trial.suggest_float("lr", 1e-4, 5e-1, log=True)
        lambda_pde = trial.suggest_float("lambda_pde", 0.1, 10.0, log=True)
        lambda_ic_bc = trial.suggest_float("lambda_ic_bc", 0.1, 10.0, log=True)

        layers = [3] + [args.width] * DEPTH + [1]
        lambda_weights = {"pde": lambda_pde, "ic": lambda_ic_bc,
                          "bc": lambda_ic_bc}
        fourier, oversample = 0, 0.0
        if args.search_levers:
            # Categorical sizes keep the compile count bounded (each
            # fourier size / oversample ratio is its own program).
            fourier = trial.suggest_categorical(
                "fourier_features", [0, 32, 64, 128]
            )
            oversample = trial.suggest_categorical(
                "adaptive_oversample", [0.0, 2.0, 3.0]
            )
        model = PINN(layers, problem, domain, activation=ACTIVATION,
                     seed=common.SEED + trial.number,
                     fourier_features=fourier)
        try:
            start_time = time.time()
            model.train(
                batch_sizes, args.epochs, lr, lambda_weights,
                early_stopping_patience=1000,
                early_stopping_min_delta=1e-7,
                restore_best_weights=True,
                adaptive_oversample=oversample,
            )
            _, l2_error, max_error = model.compute_errors(
                mesh_data, problem.analytical_solution
            )
            trial.set_user_attr("train_time", time.time() - start_time)
            return (l2_error - 1e-5) ** 2 + (max_error - 1e-5) ** 2
        except Exception as e:
            print(f"Trial failed: {e}")
            return float("inf")

    n_jobs = args.n_jobs or (os.cpu_count() or 1)
    start_ = time.time()
    study = hpo_engine.create_study(direction="minimize")
    study.optimize(objective, n_trials=args.n_trials, n_jobs=n_jobs)
    end_ = time.time()
    print(f"\nMinimization ended in {end_ - start_:0.2f}")

    df_results = study.trials_dataframe()
    df_results.to_csv(f"optuna_pinn_results_{args.width}.csv", index=False)
    print("Best trial:")
    print(study.best_trial.params)
    return df_results


if __name__ == "__main__":
    main()
