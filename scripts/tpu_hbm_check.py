"""TPU solver-level check + scaling for the HBM-tiled fused solver.

Correctness at 257 (fused VMEM vs fused_hbm through CRBESolver — proven
bit-identical on hardware 2026-08-17; rerun with --with-baseline), then
solver-level steps/s at 513..2049. Timings include the boundary lift and
family permutations but NOT power_bounds (cached eagerly per solver since
the bounds-reuse change — part of what this script validates).

Run detached: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_hbm_check.py
"""

import sys
import time

import jax
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver


def log(*a):
    print(*a, flush=True)


def run(ms, nt, impl, iters, warm_reps=1, assembly="auto"):
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    s = CRBESolver(domain, problem, md, matvec_impl=impl,
                   solver_method="chebyshev", chebyshev_iters=iters,
                   extrapolate_warm_start=True, assembly=assembly)
    t0 = time.time()
    out = s.solve(store_solutions=False, collect_iters=False)
    log(f"  {impl} ms={ms}: first call (compile+run) {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(warm_reps):
        t0 = time.time()
        out = s.solve(store_solutions=False, collect_iters=False)
        best = min(best, time.time() - t0)
    sps = (nt - 1) / best
    log(f"  {impl} ms={ms} nt={nt} k={iters}: {best*1e3:.1f} ms warm -> "
        f"{sps:,.0f} steps/s")
    errs = s.compute_errors(problem.analytical_solution)
    log(f"  errors (rel_l2, l2, max): {tuple(float(e) for e in errs)}")
    return out, sps


def main():
    log(f"device: {jax.devices()[0]}")

    if "--with-baseline" in sys.argv:
        log("== correctness: 257, fused (VMEM) vs fused_hbm ==")
        a, _ = run(257, 101, "fused", 4)
        b, _ = run(257, 101, "fused_hbm", 4)
        diff = float(jnp.max(jnp.abs(a - b)))
        log(f"  maxdiff {diff:.3e} (scale {float(jnp.max(jnp.abs(a))):.3e})")
        if diff > 1e-5 * float(jnp.max(jnp.abs(a))) + 1e-7:
            log("  MISMATCH — investigate before trusting timings")
            sys.exit(1)

    log("== solver-level scaling past the VMEM envelope ==")
    rows = []
    # 4097 runs the BALANCED config (nt=4001, k=8: dt must scale with h
    # or the answer is temporal-error-limited and conditioning needs
    # k>=20 — CLAUDE.md); the rest use the fixed nt=1001 ladder.
    for ms, nt, iters, asm in [(513, 1001, 6, "auto"), (769, 1001, 8, "auto"),
                          (1025, 1001, 8, "auto"), (2049, 1001, 10, "patch"),
                          (4097, 4001, 8, "patch")]:
        _, sps = run(ms, nt, "fused_hbm", iters, warm_reps=3, assembly=asm)
        rows.append(dict(ms=ms, nt=nt, k=iters, assembly=asm,
                         solver_steps_per_sec=round(sps, 1)))
    import csv

    with open("results_snapshot/hbm_scaling.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    log(f"wrote {len(rows)} rows to results_snapshot/hbm_scaling.csv")


if __name__ == "__main__":
    main()
