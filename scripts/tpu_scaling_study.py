"""Large-mesh scaling study: CRBE scan+stencil path from 256^2 to 1024^2.

The fused VMEM-resident solver tops out near 276^2 (48 canvases); beyond
that the scan+stencil path streams coefficients from HBM and has no size
ceiling until HBM itself. This script measures warm steps/s, DOF
throughput and solution sanity per mesh size and MERGES the rows into
results_snapshot/crbe_scaling.csv (existing rows for other mesh sizes are
kept; rerunning a size replaces its row).

Run on TPU in the background (one remote compile per size, minutes each):

    python scripts/tpu_scaling_study.py [--sizes 256 384 512 768 1024]
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[256, 384, 512, 768, 1024])
    ap.add_argument("--nt", type=int, default=1001)
    ap.add_argument("--extrapolate", action="store_true",
                    help="Second-order (extrapolated) warm starts")
    ap.add_argument("--collect_iters", action="store_true",
                    help="Also record mean/max BiCGStab iterations per "
                         "step (separate compiled variant; timing columns "
                         "then reflect the collecting program)")
    ap.add_argument("--impl", default="stencil",
                    choices=["stencil", "uniform", "ell"],
                    help="matvec implementation for the scan path")
    ap.add_argument("--out", default="results_snapshot/crbe_scaling.csv")
    args = ap.parse_args(argv)

    domain, problem = apt.Domain(), apt.Problem()
    rows = []
    for ms in args.sizes:
        t0 = time.time()
        md = apt.MeshData(apt.create_mesh(ms, 20.0), domain, nt=args.nt)
        setup = time.time() - t0
        n = md.number_of_segments
        print(f"ms={ms}: {n} DOFs, setup {setup:.1f}s",
              file=sys.stderr, flush=True)

        solver = CRBESolver(domain, problem, md, matvec_impl=args.impl,
                            solver_tol=1e-7, solver_maxiter=50,
                            extrapolate_warm_start=args.extrapolate)
        kw = dict(store_solutions=False, collect_iters=args.collect_iters)
        t0 = time.time()
        solver.solve(**kw)
        cold = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time()
            solver.solve(**kw)
            times.append(time.time() - t0)
        warm = min(times)
        steps = args.nt - 1
        rel, l2, mx = solver.compute_errors(problem.analytical_solution)
        row = {
            "mesh_size": ms, "n_dofs": n, "nt": args.nt,
            "setup_s": round(setup, 2), "cold_s": round(cold, 2),
            "warm_s": round(warm, 4),
            "steps_per_sec": round(steps / warm, 1),
            "dof_steps_per_sec": round(n * steps / warm, 0),
            "rel_l2": rel, "max_error": mx,
        }
        if args.collect_iters:
            it = np.asarray(solver.solver_iterations)
            row["mean_iters"] = round(float(it.mean()), 2)
            row["max_iters"] = int(it.max())
        rows.append(row)
        print(row, file=sys.stderr, flush=True)

    # Merge with any existing table so partial reruns never clobber rows
    # for sizes they did not measure.
    by_size = {}
    if os.path.exists(args.out):
        with open(args.out, newline="") as f:
            for old in csv.DictReader(f):
                by_size[int(old["mesh_size"])] = old
    for row in rows:
        by_size[int(row["mesh_size"])] = row
    merged = [by_size[k] for k in sorted(by_size)]
    fieldnames = list(dict.fromkeys(
        k for row in merged for k in row
    ))  # union, first-seen order (rows may differ in --collect_iters cols)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames, restval="")
        w.writeheader()
        w.writerows(merged)
    print(f"saved {args.out}", file=sys.stderr, flush=True)
    return merged


if __name__ == "__main__":
    main()
