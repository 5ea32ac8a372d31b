"""General-path (scan, BiCGStab) solve at 2049^2 via patch assembly.

The point: the GENERAL path — adaptive BiCGStab, any source term,
optional snapshot storage — also scales past the global-assembly OOM
wall, not just the fused Chebyshev kernel. Final-state-only here (a full
snapshot trajectory at 2049^2 would be ~50 GB)."""

import time

import jax
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver


def log(*a):
    print(*a, flush=True)


def main():
    log(f"device: {jax.devices()[0]}")
    ms, nt = 2049, 1001
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    # Chebyshev, not BiCGStab: at 12.6M DOFs in f32 BiCGStab's 1e-7
    # residual tolerance is unreachable, so it burns maxiter every step
    # (measured: 3 steps/s at nt=101; the solution itself was fine).
    # nt=1001 keeps dt inside Chebyshev's convergence ellipse
    # (dt |v| / h < 0.4 — the eager applicability check warns otherwise).
    s = CRBESolver(domain, problem, md, matvec_impl="uniform",
                   assembly="patch", extrapolate_warm_start=True,
                   solver_method="chebyshev", chebyshev_iters=10)
    t0 = time.time()
    s.solve(store_solutions=False)
    log(f"first call (compile+run) {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = s.solve(store_solutions=False)
        best = min(best, time.time() - t0)
    log(f"scan/chebyshev ms={ms} nt={nt}: {best*1e3:.1f} ms -> "
        f"{(nt-1)/best:,.0f} steps/s")
    errs = s.compute_errors(problem.analytical_solution)
    log(f"errors (rel_l2, l2, max): {tuple(float(e) for e in errs)}")


if __name__ == "__main__":
    main()
