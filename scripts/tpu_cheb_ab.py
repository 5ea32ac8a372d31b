"""Chebyshev A/B on TPU: fused-kernel iteration sweep at the headline mesh,
newly-reachable fused sizes, and scan-path Chebyshev at large meshes.

Appends rows to results_snapshot/cheb_ab.csv. Run in the background:

    python scripts/tpu_cheb_ab.py --stage fused   # 257 iters sweep + 385/481
    python scripts/tpu_cheb_ab.py --stage scan    # 512/1024 scan chebyshev
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_solver(solver, nt):
    t0 = time.time()
    solver.solve(store_solutions=False)
    cold = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        solver.solve(store_solutions=False)
        times.append(time.time() - t0)
    warm = min(times)
    return cold, warm, (nt - 1) / warm


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["fused", "scan"], default="fused")
    ap.add_argument("--nt", type=int, default=1001)
    ap.add_argument("--out", default="results_snapshot/cheb_ab.csv")
    args = ap.parse_args(argv)
    nt = args.nt
    domain, problem = apt.Domain(), apt.Problem()
    rows = []

    if args.stage == "fused":
        # Headline mesh: chebyshev iteration sweep vs the bicg fused champ.
        md = apt.MeshData(apt.create_mesh(257, 20.0), domain, nt=nt)
        ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                         solver_tol=1e-7, solver_maxiter=50)
        ref.solve(store_solutions=False)
        u_ref = np.asarray(ref.solutions[-1])
        for iters in (4, 5, 6):
            s = CRBESolver(domain, problem, md, matvec_impl="fused",
                           solver_method="chebyshev",
                           chebyshev_iters=iters,
                           extrapolate_warm_start=True)
            cold, warm, sps = time_solver(s, nt)
            diff = float(np.abs(np.asarray(s.solutions[-1]) - u_ref).max())
            rows.append({"mesh_size": 257, "path": "fused-cheb",
                         "iters": iters, "nt": nt, "warm_s": round(warm, 4),
                         "steps_per_sec": round(sps, 1),
                         "max_diff_vs_scan": diff})
            log(rows[-1])
        # Newly-reachable fused sizes (chebyshev: 12-15 canvases).
        for ms, iters in ((385, 6), (481, 6)):
            md = apt.MeshData(apt.create_mesh(ms, 20.0), domain, nt=nt)
            ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                             solver_tol=1e-7, solver_maxiter=50)
            ref.solve(store_solutions=False)
            u_ref = np.asarray(ref.solutions[-1])
            s = CRBESolver(domain, problem, md, matvec_impl="fused",
                           solver_method="chebyshev", chebyshev_iters=iters,
                           extrapolate_warm_start=True)
            try:
                cold, warm, sps = time_solver(s, nt)
            except Exception as e:  # noqa: BLE001 — record and continue
                log(f"ms={ms} fused-cheb failed: {type(e).__name__}: {e}")
                continue
            diff = float(np.abs(np.asarray(s.solutions[-1]) - u_ref).max())
            rows.append({"mesh_size": ms, "path": "fused-cheb",
                         "iters": iters, "nt": nt, "warm_s": round(warm, 4),
                         "steps_per_sec": round(sps, 1),
                         "max_diff_vs_scan": diff})
            log(rows[-1])
    else:
        for ms, iters in ((512, 8), (1024, 12)):
            md = apt.MeshData(apt.create_mesh(ms, 20.0), domain, nt=nt)
            ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                             solver_tol=1e-7, solver_maxiter=50)
            ref.solve(store_solutions=False)
            u_ref = np.asarray(ref.solutions[-1])
            s = CRBESolver(domain, problem, md, matvec_impl="uniform",
                           solver_method="chebyshev", chebyshev_iters=iters,
                           extrapolate_warm_start=True)
            cold, warm, sps = time_solver(s, nt)
            diff = float(np.abs(np.asarray(s.solutions[-1]) - u_ref).max())
            rows.append({"mesh_size": ms, "path": "scan-cheb",
                         "iters": iters, "nt": nt, "warm_s": round(warm, 4),
                         "steps_per_sec": round(sps, 1),
                         "max_diff_vs_scan": diff})
            log(rows[-1])

    key = lambda r: (int(r["mesh_size"]), r["path"], int(r["iters"]))
    by = {}
    if os.path.exists(args.out):
        with open(args.out, newline="") as f:
            for old in csv.DictReader(f):
                by[key(old)] = old
    for r in rows:
        by[key(r)] = r
    merged = [by[k] for k in sorted(by, key=str)]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(merged[0]), restval="")
        w.writeheader()
        w.writerows(merged)
    log(f"saved {args.out}")


if __name__ == "__main__":
    main()
