"""Quasi-static chunked solves vs a frozen wind on the turning-wind
oracle (models/unsteady.solve_time_varying): the error table behind the
time-varying-coefficient claims. Writes
results_snapshot/unsteady_wind.csv.

    APT_PLATFORM=cpu python scripts/unsteady_wind_demo.py
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("APT_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.unsteady import solve_time_varying


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_size", type=int, default=32)
    ap.add_argument("--nt", type=int, default=128)
    ap.add_argument("--order", type=int, default=2)
    ap.add_argument("--out", default="results_snapshot/unsteady_wind.csv")
    args = ap.parse_args()

    domain = apt.Domain()
    p = apt.TurningWindProblem(speed=1.0, omega_t=0.5, D=0.1)
    md = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0), domain,
                      nt=args.nt, dtype=jnp.float64)
    t_col = jnp.full((md.number_of_segments, 1), domain.T,
                     md.midpoints.dtype)
    ex = p.analytical_solution(jnp.concatenate([md.midpoints, t_col],
                                               axis=1))
    rows = []
    n_steps = args.nt - 1
    ks = [k for k in (n_steps, 16, 8, 4, 2, 1) if n_steps % k == 0]
    for k in ks:
        t0 = time.time()
        u = solve_time_varying(p, md, reassemble_every=k,
                               time_scheme_order=args.order, tol=1e-11,
                               maxiter=800, store_solutions=False)
        solve_t = time.time() - t0
        rel = float(jnp.linalg.norm(u[0] - ex) / jnp.linalg.norm(ex))
        label = "frozen" if k == n_steps else "chunked"
        rows.append([args.mesh_size, md.number_of_segments, args.nt,
                     args.order, k, label, f"{rel:.6f}",
                     round(solve_t, 2), jax.default_backend()])
        print(f"reassemble_every={k:4d} ({label}): rel_l2={rel:.4f} "
              f"[{solve_t:.1f}s]", file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["mesh_size", "n_dofs", "nt", "order",
                    "reassemble_every", "mode", "rel_l2", "solve_time_s",
                    "platform"])
        w.writerows(rows)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
