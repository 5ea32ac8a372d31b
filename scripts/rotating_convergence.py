"""h-refinement convergence of the CRBE solver on the variable-wind
RotatingPlumeProblem (exact closed-form oracle — rigid rotation commutes
with diffusion, problems.RotatingPlumeProblem docstring).

Validates the centroid-sampled variable-coefficient assembly end to end:
the measured L2 rate must be comparable to the constant-wind family's
(the reference's empirical O(h^1.37), utils/data_visualization.py:62-64 —
the reference itself has no variable-coefficient capability at all).
Writes results_snapshot/rotating_convergence.csv (BE and Crank-Nicolson
rows; CN separates the spatial rate from the temporal floor).

    APT_PLATFORM=cpu python scripts/rotating_convergence.py
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
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import (
    AnisotropicPlumeProblem,
    RotatingPlumeProblem,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_sizes", type=int, nargs="*",
                    default=[8, 16, 32, 64, 128])
    ap.add_argument("--nt", type=int, default=128)
    ap.add_argument("--problem", default="rotating",
                    choices=("rotating", "anisotropic"))
    ap.add_argument("--out", default=None,
                    help="default: results_snapshot/"
                         "<problem>_convergence.csv")
    args = ap.parse_args()
    if args.out is None:
        args.out = f"results_snapshot/{args.problem}_convergence.csv"

    domain = apt.Domain()
    if args.problem == "rotating":
        problem = RotatingPlumeProblem()  # omega=0.1, D=0.05, puff (5,0)
    else:  # strongly anisotropic: along-wind 10x the cross-wind mixing
        problem = AnisotropicPlumeProblem(Dx=0.2, Dy=0.02)

    rows = []
    for order in (1, 2):
        errs, hs = [], []
        for ms in args.mesh_sizes:
            md = apt.MeshData(apt.create_mesh(ms, 20.0), domain,
                              nt=args.nt, dtype=jnp.float64)
            s = CRBESolver(domain, problem, md, time_scheme_order=order,
                           solver_tol=1e-11, solver_maxiter=800)
            t0 = time.time()
            s.solve(store_solutions=False)
            solve_t = time.time() - t0
            rel, l2, mx = s.compute_errors(problem.analytical_solution)
            h = float(md.diameter)
            hs.append(h)
            errs.append(rel)
            rate = (np.log(errs[-2] / errs[-1]) / np.log(hs[-2] / hs[-1])
                    if len(errs) > 1 else float("nan"))
            rows.append([order, ms, md.number_of_segments, args.nt,
                         round(h, 5), f"{rel:.6f}", f"{mx:.3e}",
                         round(rate, 3) if rate == rate else "",
                         round(solve_t, 2), jax.default_backend()])
            print(f"order={order} ms={ms:4d}: rel_l2={rel:.4f} "
                  f"max={mx:.3e} rate={rate:.2f} [{solve_t:.1f}s]",
                  file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["time_scheme_order", "mesh_size", "n_dofs", "nt", "h",
                    "rel_l2", "max_error", "l2_rate", "solve_time_s",
                    "platform"])
        w.writerows(rows)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
