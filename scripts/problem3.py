"""Problem 3 case study: square-pulse release, CRBE vs PINN.

Counterpart of scripts/problem3.py: square-pulse IC on [8,12]^2 with zero
boundary/source and v=(1,0), D=0.1 (problem3.py:30-46); CRBE solve then a
[3,30,30,30,1] PINN with lambda=(1,8,1), lr=1e-3, 3000 epochs, IC/BC budget
fractions 0.35/0.05 (problem3.py:79-89); snapshot plots at steps
[0, 64, 127] and the PINN-vs-CRBE L2/max discrepancy at t=T
(problem3.py:106-132 — the cross-method consistency metric, since no
analytical solution exists).

Fixes over the reference (defect D4): the reference's ``Domain`` is used
without an import (problem3.py:54, NameError as-is) and is constructed with
Lx=Ly=2000 while the pulse lives in [8,12]^2 — a typo'd domain 100x larger
than the mesh in every companion script; here the standard (20, 20, 10)
domain is used, matching problem3_comprehensive_analysis2.py:556-559.

Run: ``python -m scripts.problem3 [--epochs N]``.
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.models.pinn import PINN
from airpollution_tpu.problems import SquarePulseProblem as Problem

from experiments import common


def main(argv=None):
    parser = argparse.ArgumentParser(description="Problem 3 case study.")
    parser.add_argument("--epochs", type=int, default=3000)
    parser.add_argument("--m_size", type=int, default=64)
    parser.add_argument("--n_steps", type=int, default=128)
    args = parser.parse_args(argv)

    np.random.seed(common.SEED)
    common.print_device()

    problem = Problem()
    domain = apt.Domain(Lx=20, Ly=20, T=10)

    mesh = apt.create_mesh(args.m_size, domain_size=20.0)
    mesh_data = apt.MeshData(mesh, domain, nt=args.n_steps)

    solver1 = CRBESolver(domain, problem, mesh_data,
                         stiffness_convention="reference")
    solver1.solve()

    # PINN with the problem3 collocation fractions (problem3.py:79-82).
    n_col = round(mesh_data.number_of_segments / 1.4)
    batch_sizes = {
        "pde": n_col,
        "ic": round(0.35 * n_col),
        "bc": round(0.05 * n_col),
    }
    lambda_weights = {"pde": 1.0, "ic": 8.0, "bc": 1.0}
    layers = [3] + [30] * 3 + [1]

    model = PINN(layers, problem, domain, seed=common.SEED)
    model.train(
        batch_sizes, args.epochs, 1e-3, lambda_weights,
        early_stopping_patience=10, early_stopping_min_delta=1e-6,
        restore_best_weights=True,
    )
    model.plot_history(name="pinn3")

    for it in [0, args.n_steps // 2, args.n_steps - 1]:
        solver1.plot_interpolated_solution(time_index=it, name="crbe3")
        t = float(mesh_data.time_discr[it])
        model.plot_interpolated_solution(t, mesh_data, name="pinn3")

    # Cross-method discrepancy at final time (problem3.py:113-132).
    t_col = jnp.full((mesh_data.number_of_segments, 1), domain.T)
    xyt = jnp.concatenate(
        [mesh_data.midpoints, t_col.astype(mesh_data.midpoints.dtype)], axis=1
    )
    u_pinn = np.asarray(model.forward(xyt)).ravel()
    u_crbe = np.asarray(solver1.solutions[-1, :])
    error = np.abs(u_pinn - u_crbe)
    l2_error = np.linalg.norm(error)
    max_error = np.max(error)

    print()
    print("L2 error: ", l2_error)
    print("Max error: ", max_error)
    return l2_error, max_error


if __name__ == "__main__":
    main()
