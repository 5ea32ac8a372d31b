"""Fused-solver A/B on TPU: canvas vs uniform operator, and the new
uniform-only sizes beyond the canvas VMEM limit.

Measures warm wall-clock for 1000 implicit steps per (size, operator)
cell, checks the fused result against the converged scan path, and merges
rows into results_snapshot/fused_ab.csv. Run in the background on TPU
(one remote compile per cell, minutes each):

    python scripts/tpu_fused_ab.py [--sizes 257 321 385] [--order 1]
"""

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver, _pallas_fused_fits
from airpollution_tpu.ops.stencil import build_stencil_pattern


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[257, 321, 385])
    ap.add_argument("--nt", type=int, default=1001)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--out", default="results_snapshot/fused_ab.csv")
    args = ap.parse_args(argv)

    domain, problem = apt.Domain(), apt.Problem()
    rows = []
    for ms in args.sizes:
        md = apt.MeshData(apt.create_mesh(ms, 20.0), domain, nt=args.nt)
        n = md.number_of_segments
        pattern = build_stencil_pattern(
            md._host_t2s, md._host_ell_cols, md.structured_n
        )
        # Converged scan-path result for the correctness check.
        check = CRBESolver(domain, problem, md, matvec_impl="uniform",
                           time_scheme_order=args.order,
                           solver_tol=1e-7, solver_maxiter=50)
        check.solve(store_solutions=False)
        u_ref = np.asarray(check.solutions[-1])
        log(f"ms={ms}: {n} DOFs, scan reference ready")

        for op in ("canvas", "uniform"):
            if not _pallas_fused_fits(pattern, extrapolate=True,
                                      uniform=(op == "uniform")):
                log(f"ms={ms} {op}: does not fit VMEM, skipped")
                continue
            solver = CRBESolver(
                domain, problem, md, matvec_impl="fused",
                time_scheme_order=args.order,
                fused_iters=args.iters, fused_operator=op,
                extrapolate_warm_start=True,
            )
            t0 = time.time()
            solver.solve(store_solutions=False)
            cold = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                solver.solve(store_solutions=False)
                times.append(time.time() - t0)
            warm = min(times)
            diff = float(np.abs(
                np.asarray(solver.solutions[-1]) - u_ref
            ).max())
            row = {
                "mesh_size": ms, "n_dofs": n, "operator": op,
                "nt": args.nt, "iters": args.iters, "order": args.order,
                "cold_s": round(cold, 1), "warm_s": round(warm, 4),
                "steps_per_sec": round((args.nt - 1) / warm, 1),
                "max_diff_vs_scan": diff,
            }
            rows.append(row)
            log(row)

    key = lambda r: (int(r["mesh_size"]), r["operator"])
    by = {}
    if os.path.exists(args.out):
        with open(args.out, newline="") as f:
            for old in csv.DictReader(f):
                by[key(old)] = old
    for r in rows:
        by[key(r)] = r
    merged = [by[k] for k in sorted(by)]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(merged[0]), restval="")
        w.writeheader()
        w.writerows(merged)
    log(f"saved {args.out}")


if __name__ == "__main__":
    main()
