"""Diffusion-coefficient sensitivity sweep (parity with
experiments/sensitivity_analysis.py).

For D in [0.001, 0.01, 0.1, 1.0, 10] at the fixed mesh index 4 (ms=64,
sensitivity_analysis.py:49, :62, :74): train a PINN and run CRBE per D,
record both rel-L2 and max errors, write
``experimental_results/sensibility/df_sensitivity_data.csv`` (directory
spelling kept from the reference, :37) with columns mesh_size,
diffusion_coef, pinn_l2_error, max_error, cr_l2_error, cr_max_error
(:108-115). Early-stopping patience is fixed at 500 regardless of the flag,
mirroring sensitivity_analysis.py:65. (The vmapped whole-sweep variant lives
in ``airpollution_tpu.parallel.sweep``.)
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.models.pinn import PINN

from experiments import common

D_LIST = [0.001, 0.01, 0.1, 1.0, 10]
IDX_MESH_SIZE = 4  # ms = 64 (sensitivity_analysis.py:49)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="PINN/CRBE sensitivity to the diffusion coefficient."
    )
    parser.add_argument("--width", type=int, default=4)
    parser.add_argument("--activation", type=str, default="tanh")
    parser.add_argument("--epochs", type=int, default=0)
    parser.add_argument("--early_stopping_patience", type=int,
                        default=500)
    parser.add_argument("--restore_best_weights", type=common.str2bool,
                        default=True)
    args = parser.parse_args(argv)

    np.random.seed(common.SEED)
    common.print_device()

    exp_dir = "experimental_results/sensibility"
    os.makedirs(exp_dir, exist_ok=True)
    filename = f"{exp_dir}/df_sensitivity_data.csv"

    domain = apt.Domain()
    j = IDX_MESH_SIZE
    mesh_size = common.MESH_SIZES[j]
    layers = [3] + [common.N_NEURONS[j]] * args.width + [1]
    lr = common.LR_LIST[j]
    epochs = (common.EPOCHS_LIST[j] if not args.epochs else args.epochs)
    # Default 500 mirrors the reference's hard-coded value
    # (sensitivity_analysis.py:65); unlike the reference, an explicit
    # flag value is honored.
    early_stopping_patience = args.early_stopping_patience

    print(f"Training for mesh size {mesh_size} ...")
    mesh = apt.create_mesh(mesh_size, domain_size=common.DOMAIN_SIZE)
    mesh_data = apt.MeshData(mesh, domain, nt=common.N_STEPS)
    batch_sizes = common.collocation_budget(mesh_data.number_of_segments)

    sensitivity_data = []
    for D in D_LIST:
        print(f"Running for D = {D}")
        pproblem = apt.Problem(D=D, sigma=1.0)
        model = PINN(layers, pproblem, domain, activation=args.activation,
                     seed=common.SEED)
        model.train(
            batch_sizes, epochs, lr, common.LAMBDA_WEIGHTS,
            early_stopping_patience=early_stopping_patience,
            early_stopping_min_delta=1e-6,
            restore_best_weights=args.restore_best_weights,
        )
        pinn_rel_l2, _, pinn_max = model.compute_errors(
            mesh_data, pproblem.analytical_solution
        )

        cproblem = apt.Problem(D=D, sigma=1.0)
        solver = CRBESolver(domain, cproblem, mesh_data,
                            stiffness_convention="reference")
        solver.solve()
        crbe_rel_l2, _, crbe_max = solver.compute_errors(
            cproblem.analytical_solution
        )

        sensitivity_data.append({
            "mesh_size": mesh_size,
            "diffusion_coef": D,
            "pinn_l2_error": pinn_rel_l2,
            "max_error": pinn_max,
            "cr_l2_error": crbe_rel_l2,
            "cr_max_error": crbe_max,
        })
        # Incremental save (the reference only writes at the end,
        # sensitivity_analysis.py:121-123 — a crash loses everything).
        pd.DataFrame(sensitivity_data).to_csv(filename)
        print("=" * 50)

    df = pd.DataFrame(sensitivity_data)
    df.to_csv(filename)
    print(f"Sensitivity analysis ended and results are saved at {filename}")
    return df


if __name__ == "__main__":
    main()
