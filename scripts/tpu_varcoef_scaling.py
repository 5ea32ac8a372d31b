"""Variable-coefficient (canvas-operator) solver scaling on the TPU:
scan-path Chebyshev vs the canvas stripe kernel
(ops/pallas_hbm.fused_solve_canvas_hbm) on the RotatingPlumeProblem.

Writes/merges results_snapshot/varcoef_scaling.csv (one row per
(mesh_size, path); reruns update rows in place, --skip_existing resumes
after tunnel drops). Run in background on the TPU — each (size, path)
is its own remote compile (~1-7 min first touch):

    python scripts/tpu_varcoef_scaling.py --mesh_sizes 257 513 1025
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

import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import RotatingPlumeProblem


def _load(path):
    rows = {}
    if os.path.exists(path):
        with open(path, newline="") as f:
            for r in csv.DictReader(f):
                rows[(int(r["mesh_size"]), r["path"])] = r
    return rows


def _save(path, rows):
    cols = ["mesh_size", "n_dofs", "nt", "path", "iters", "steps_per_s",
            "solve_time_s", "rel_l2", "warmup_s", "platform"]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        for k in sorted(rows, key=lambda k: (k[0], k[1])):
            w.writerow(rows[k])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_sizes", type=int, nargs="*",
                    default=[257, 513, 1025])
    ap.add_argument("--nt", type=int, default=1001)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--paths", nargs="*",
                    default=["fused_hbm", "stencil"])
    ap.add_argument("--skip_existing", action="store_true")
    ap.add_argument("--out", default="results_snapshot/varcoef_scaling.csv")
    args = ap.parse_args()

    domain = apt.Domain()
    # Diffusion-dominated enough for Chebyshev at these (h, dt); the
    # rotation keeps the operator genuinely position-dependent.
    problem = RotatingPlumeProblem(omega=0.05, D=0.3)
    rows = _load(args.out)

    for ms in args.mesh_sizes:
        md = apt.MeshData(apt.create_mesh(ms, 20.0), domain, nt=args.nt)
        for path in args.paths:
            key = (ms, path)
            if args.skip_existing and key in rows:
                print(f"skip {key} (existing)", file=sys.stderr,
                      flush=True)
                continue
            s = CRBESolver(
                domain, problem, md, matvec_impl=path,
                solver_method="chebyshev", chebyshev_iters=args.iters,
                extrapolate_warm_start=True,
            )
            t0 = time.time()
            s.solve(store_solutions=False, collect_iters=False)
            warm = time.time() - t0
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.time()
                s.solve(store_solutions=False, collect_iters=False)
                best = min(best, time.time() - t0)
            rel, _, _ = s.compute_errors(problem.analytical_solution)
            sps = (args.nt - 1) / best
            rows[key] = dict(
                mesh_size=ms, n_dofs=md.number_of_segments, nt=args.nt,
                path=path, iters=args.iters,
                steps_per_s=round(sps, 1),
                solve_time_s=round(best, 3), rel_l2=f"{rel:.5f}",
                warmup_s=round(warm, 1),
                platform=jax.default_backend(),
            )
            print(f"{ms}^2 {path}: {sps:.0f} steps/s "
                  f"(rel_l2 {rel:.4f}, warm-up {warm:.0f}s)",
                  file=sys.stderr, flush=True)
            _save(args.out, rows)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
