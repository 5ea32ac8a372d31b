"""Sourced fused solves on TPU: the emission forward model at fused
speed.

Measures warm wall-clock for nt-1 implicit steps of the
GaussianSourceProblem (steady source, in-kernel load) on the fused
paths, with the zero-source Problem timed alongside as the overhead
baseline, and a scan-path correctness check per size. Merges rows into
results_snapshot/sourced_fused.csv. Run in the background on TPU (one
remote compile per cell, minutes each):

    python scripts/tpu_sourced_fused.py [--sizes 257 513] [--nt 1001]
"""

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import GaussianSourceProblem


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_solver(solver, repeats=3):
    t0 = time.time()
    solver.solve(store_solutions=False)
    cold = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.time()
        solver.solve(store_solutions=False)
        times.append(time.time() - t0)
    return cold, min(times)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[257, 513])
    ap.add_argument("--nt", type=int, default=1001)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--out", default="results_snapshot/sourced_fused.csv")
    args = ap.parse_args(argv)

    domain = apt.Domain()
    src_problem = GaussianSourceProblem(q=50.0, xs=-8.0, ys=5.0,
                                        sigma_s=3.0)
    zero_problem = apt.Problem()
    rows = []
    for ms in args.sizes:
        md = apt.MeshData(apt.create_mesh(ms, 20.0), domain, nt=args.nt)
        n = md.number_of_segments
        impl = "fused" if ms <= 481 else "fused_hbm"

        # Scan-path correctness oracle on a short time grid (the full
        # nt would be scan-speed; 33 steps pin the load semantics).
        md_chk = apt.MeshData(apt.create_mesh(ms, 20.0), domain, nt=33)
        chk_scan = CRBESolver(domain, src_problem, md_chk,
                              matvec_impl="uniform",
                              time_scheme_order=args.order,
                              solver_tol=1e-7, solver_maxiter=60)
        u_ref = np.asarray(chk_scan.solve(store_solutions=False))
        chk_fused = CRBESolver(domain, src_problem, md_chk,
                               matvec_impl=impl,
                               time_scheme_order=args.order,
                               solver_method="chebyshev",
                               chebyshev_iters=max(args.iters + 2, 6))
        u_fused = np.asarray(chk_fused.solve(store_solutions=False))
        diff = float(np.abs(u_fused - u_ref).max() /
                     max(np.abs(u_ref).max(), 1e-30))
        log(f"ms={ms}: {n} DOFs, fused-vs-scan sourced rel maxdiff "
            f"{diff:.2e}")

        for label, problem in (("sourced", src_problem),
                               ("zero_source", zero_problem)):
            solver = CRBESolver(
                domain, problem, md, matvec_impl=impl,
                time_scheme_order=args.order,
                solver_method="chebyshev", chebyshev_iters=args.iters,
                extrapolate_warm_start=True,
            )
            cold, warm = time_solver(solver)
            steps_s = (args.nt - 1) / warm
            rows.append({
                "mesh_size": ms, "n_dofs": n, "impl": impl,
                "problem": label, "nt": args.nt, "iters": args.iters,
                "order": args.order, "cold_s": round(cold, 3),
                "warm_s": round(warm, 4),
                "steps_per_s": round(steps_s, 1),
                "rel_maxdiff_vs_scan": diff if label == "sourced"
                else "",
            })
            log(f"ms={ms} {label}: warm {warm:.4f}s = "
                f"{steps_s:.0f} steps/s (cold {cold:.1f}s)")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    exists = os.path.exists(args.out)
    with open(args.out, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        if not exists:
            w.writeheader()
        w.writerows(rows)
    log(f"wrote {len(rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
