"""Problem 3 comprehensive physics diagnostics driver.

Counterpart of BOTH reference variants
(scripts/problem3_comprehensive_analysis.py — segment-length quadrature —
and scripts/problem3_comprehensive_analysis2.py — triangle quadrature):
run CRBE and a PINN on the square-pulse problem, then mass conservation,
center-of-mass tracking vs the theoretical ``(10, 10) + v t``, spreading
vs ``sigma0^2 + 2 D t``, peak tracking, transect profiles, the five
diagnostic figures, and the summary statistics block
(analysis2.py:612-639). The per-triangle-per-timestep host loops of the
reference become single batched computations
(airpollution_tpu.diagnostics).

Run: ``python -m scripts.problem3_comprehensive_analysis
[--quadrature triangle|segment] [--epochs N]``.
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.diagnostics import ComprehensiveAnalysis
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.models.pinn import PINN
from airpollution_tpu.problems import SquarePulseProblem as Problem

from experiments import common


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Problem 3 comprehensive physics diagnostics."
    )
    parser.add_argument("--epochs", type=int, default=3000)
    parser.add_argument("--m_size", type=int, default=64)
    parser.add_argument("--quadrature", type=str, default="triangle",
                        choices=["triangle", "segment"],
                        help="triangle = analysis2.py integration; "
                             "segment = v1 segment-length weights")
    parser.add_argument("--save_dir", type=str,
                        default="section5_analysis_plots")
    args = parser.parse_args(argv)

    np.random.seed(common.SEED)
    common.print_device()

    problem = Problem()
    domain = apt.Domain()
    n_steps = 128

    mesh = apt.create_mesh(args.m_size, domain_size=20.0)
    mesh_data = apt.MeshData(mesh, domain, nt=n_steps)

    solver1 = CRBESolver(domain, problem, mesh_data,
                         stiffness_convention="reference")
    solver1.solve()

    n_col = round(mesh_data.number_of_segments / 1.4)
    batch_sizes = {
        "pde": n_col,
        "ic": round(0.35 * n_col),  # analysis2.py:574
        "bc": round(0.05 * n_col),
    }
    model = PINN([3] + [30] * 3 + [1], problem, domain, seed=common.SEED)
    model.train(
        batch_sizes, args.epochs, 1e-3,
        {"pde": 1.0, "ic": 8.0, "bc": 1.0},
        early_stopping_patience=10, early_stopping_min_delta=1e-6,
        restore_best_weights=True,
    )

    # Cross-method discrepancy (analysis2.py:594-610).
    t_col = jnp.full((mesh_data.number_of_segments, 1), domain.T,
                     mesh_data.midpoints.dtype)
    xyt = jnp.concatenate([mesh_data.midpoints, t_col], axis=1)
    u_pinn = np.asarray(model.forward(xyt)).ravel()
    u_crbe = np.asarray(solver1.solutions[-1, :])
    error = np.abs(u_pinn - u_crbe)
    print(f"Original L2 error: {np.linalg.norm(error)}")
    print(f"Original Max error: {np.max(error)}")

    print("\n=== Starting Comprehensive Analysis ===")
    analyzer = ComprehensiveAnalysis(problem, domain, mesh_data, solver1,
                                     model, quadrature=args.quadrature)
    results = analyzer.run_all_analyses()
    analyzer.plot_all_results(args.save_dir)

    print("\n=== Analysis Summary ===")
    stats = analyzer.summary_statistics()
    print(f"Mass conservation - CRBE loss: "
          f"{stats['mass_loss_crbe_pct']:.2f}%, "
          f"PINN loss: {stats['mass_loss_pinn_pct']:.2f}%")
    print(f"Center of mass error (final) - CRBE: "
          f"{stats['com_error_x_crbe']:.2f}m, "
          f"PINN: {stats['com_error_x_pinn']:.2f}m")
    print(f"Peak concentration decay - CRBE: "
          f"{stats['peak_decay_crbe_pct']:.1f}%, "
          f"PINN: {stats['peak_decay_pinn_pct']:.1f}%")

    for it in [0, n_steps // 2, n_steps - 1]:
        solver1.plot_interpolated_solution(time_index=it, name="crbe3")
        t = float(mesh_data.time_discr[it])
        model.plot_interpolated_solution(t, mesh_data, name="pinn3")
    return results


if __name__ == "__main__":
    main()
