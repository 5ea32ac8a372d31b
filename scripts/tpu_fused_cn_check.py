"""TPU validation: fused Crank-Nicolson at 256^2 (formerly VMEM-rejected).

Runs the fused CN solver at 256^2/nt=1001 on the real TPU, times the warm
solve, and cross-checks the final state against the scan-based stencil CN
path on the same mesh. Usage: python scripts/tpu_fused_cn_check.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import Domain, Problem


def main(ms=256, nt=1001):
    domain = Domain()
    problem = Problem()
    md = MeshData(create_mesh(ms, 20.0), domain, nt=nt)
    print(f"mesh {ms}^2: {md.number_of_segments} DOFs, nt={nt}",
          file=sys.stderr)

    fused = CRBESolver(domain, problem, md, matvec_impl="fused",
                       time_scheme_order=2, fused_iters=5)
    u = np.asarray(fused.solve(store_solutions=False))
    print(f"fused CN cold solve: {fused.solve_time:.3f}s", file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.time()
        fused.solve(store_solutions=False)
        times.append(time.time() - t0)
    warm = min(times)
    print(f"fused CN warm solve ({nt - 1} steps): {warm:.3f}s = "
          f"{(nt - 1) / warm:.0f} steps/s", file=sys.stderr)

    ref = CRBESolver(domain, problem, md, matvec_impl="stencil",
                     time_scheme_order=2, solver_tol=1e-9, solver_maxiter=8)
    u_ref = np.asarray(ref.solve(store_solutions=False))
    print(f"scan CN warm-ish solve: {ref.solve_time:.3f}s", file=sys.stderr)
    diff = np.max(np.abs(u - u_ref))
    print(f"fused-vs-scan max diff: {diff:.3e}", file=sys.stderr)
    rel, l2, mx = fused.compute_errors(problem.analytical_solution)
    print(f"fused CN errors: rel_l2={rel:.6f} max={mx:.3e}", file=sys.stderr)
    assert diff < 5e-5, diff


if __name__ == "__main__":
    main()
