"""TPU check + timing for the HBM-tiled fused solver (ops/pallas_hbm.py).

Correctness: fused_hbm vs the VMEM fused kernel at 257 (both f32, real
Mosaic compilation). Timing: steps/s at the sizes past the VMEM envelope
(513, 769, 1025) vs the uniform scan path numbers in CLAUDE.md.

Run on TPU in the background (first compiles are minutes through the
tunnel): ``python scripts/problem-free... `` — see repo CLAUDE.md.
"""

import sys
import time

import jax
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver


def log(*a):
    print(*a, flush=True)


def run(ms, nt, impl, iters, warm_reps=1):
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    s = CRBESolver(domain, problem, md, matvec_impl=impl,
                   solver_method="chebyshev", chebyshev_iters=iters,
                   extrapolate_warm_start=True)
    t0 = time.time()
    out = s.solve(store_solutions=False, collect_iters=False)
    log(f"  {impl} ms={ms}: first call (compile+run) {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(warm_reps):
        t0 = time.time()
        out = s.solve(store_solutions=False, collect_iters=False)
        best = min(best, time.time() - t0)
    sps = (nt - 1) / best
    log(f"  {impl} ms={ms} nt={nt}: {best*1e3:.1f} ms warm -> "
        f"{sps:,.0f} steps/s")
    errs = s.compute_errors(problem.analytical_solution)
    log(f"  errors (max, l2, rel_l2): {tuple(float(e) for e in errs)}")
    return out, sps


def main():
    log(f"device: {jax.devices()[0]}")

    log("== correctness: 257, fused (VMEM) vs fused_hbm ==")
    a, _ = run(257, 101, "fused", 4, warm_reps=1)
    b, _ = run(257, 101, "fused_hbm", 4, warm_reps=1)
    diff = float(jnp.max(jnp.abs(a - b)))
    scale = float(jnp.max(jnp.abs(a)))
    log(f"  maxdiff {diff:.3e} (scale {scale:.3e})")
    if diff > 1e-5 * scale + 1e-7:
        log("  MISMATCH — investigate before trusting timings")
        sys.exit(1)

    log("== timing past the VMEM envelope ==")
    for ms, nt, iters in [(513, 1001, 6), (769, 1001, 6), (1025, 1001, 8)]:
        run(ms, nt, "fused_hbm", iters, warm_reps=3)


if __name__ == "__main__":
    main()
