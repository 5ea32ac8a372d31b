"""PINN on the variable-wind RotatingPlumeProblem: the mesh-free solver
trains against the spatially varying residual (v(x,y) evaluated per
collocation point inside ops/autodiff.problem_pde_residual) and is scored
against the closed-form rotating-plume solution — physics entirely outside
the reference's constant-coefficient family (utils/common.py:15-30).

Uses the best-practice accuracy levers from the constant-wind campaign
(results_snapshot/pinn_accuracy_levers.csv): Fourier features + causal
weighting + a 64x4 tanh net. Writes results_snapshot/pinn_rotating.csv.

    python scripts/pinn_rotating_demo.py                   # TPU
    APT_PLATFORM=cpu python scripts/pinn_rotating_demo.py --epochs 500
"""

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("APT_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import airpollution_tpu as apt
from airpollution_tpu.models.pinn import PINN
from airpollution_tpu.problems import RotatingPlumeProblem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_size", type=int, default=32,
                    help="evaluation grid (collocation budget = ndof/1.4)")
    ap.add_argument("--epochs", type=int, default=16000)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--fourier", type=int, default=64)
    ap.add_argument("--out", default="results_snapshot/pinn_rotating.csv")
    args = ap.parse_args()

    domain = apt.Domain()
    problem = RotatingPlumeProblem()  # omega=0.1, D=0.05, puff at (5, 0)
    md = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0), domain,
                      nt=128)
    n_col = round(md.number_of_segments / 1.4)
    n_ic = round(0.2 * n_col)
    print(f"eval mesh {args.mesh_size}^2 ({md.number_of_segments} DOFs), "
          f"n_col={n_col}, net {args.width}x{args.depth}, "
          f"fourier={args.fourier}, epochs={args.epochs}",
          file=sys.stderr, flush=True)

    layers = [3] + [args.width] * args.depth + [1]
    model = PINN(layers, problem, domain, activation="tanh", seed=1234,
                 fourier_features=args.fourier)
    t0 = time.time()
    model.train({"pde": n_col, "ic": n_ic, "bc": n_ic},
                epochs=args.epochs, lr=args.lr,
                lambda_weights={"pde": 10.0, "ic": 1.0, "bc": 1.0},
                causal_eps=1.0)
    train_t = time.time() - t0
    rel, l2, mx = model.compute_errors(md, problem.analytical_solution)
    eps = args.epochs / train_t
    print(f"rel_l2={rel:.4f} max={mx:.4e} "
          f"[{train_t:.1f}s = {eps:.0f} epochs/s]",
          file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["mesh_size", "n_dofs", "n_col", "width", "depth",
                    "fourier", "epochs", "lr", "rel_l2", "max_error",
                    "train_time_s", "epochs_per_s", "final_loss",
                    "platform"])
        w.writerow([args.mesh_size, md.number_of_segments, n_col,
                    args.width, args.depth, args.fourier, args.epochs,
                    args.lr, f"{rel:.6f}", f"{mx:.4e}",
                    round(train_t, 1), round(eps, 1),
                    f"{model.history['total_loss'][-1]:.3e}",
                    jax.default_backend()])
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
