"""Crank-Nicolson through the HBM-tiled stripe kernel at 513^2.

First hardware measurement of the has_ka path (the CN RHS is one extra
in-stripe matvec; halo grows by one row-block). Compared against the
converged BiCGStab scan path for accuracy."""

import time

import jax
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver


def log(*a):
    print(*a, flush=True)


def main():
    log(f"device: {jax.devices()[0]}")
    ms, nt = 513, 1001
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    s = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                   time_scheme_order=2, solver_method="chebyshev",
                   chebyshev_iters=6, extrapolate_warm_start=True)
    t0 = time.time()
    s.solve(store_solutions=False, collect_iters=False)
    log(f"first call (compile+run) {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = s.solve(store_solutions=False, collect_iters=False)
        best = min(best, time.time() - t0)
    log(f"fused_hbm CN ms={ms} nt={nt} k=6: {best*1e3:.1f} ms -> "
        f"{(nt-1)/best:,.0f} steps/s")
    errs = s.compute_errors(problem.analytical_solution)
    log(f"errors (rel_l2, l2, max): {tuple(float(e) for e in errs)}")

    ref = CRBESolver(domain, problem, md, matvec_impl="uniform",
                     time_scheme_order=2, extrapolate_warm_start=True)
    u_ref = ref.solve(store_solutions=False)
    diff = float(jnp.max(jnp.abs(out - u_ref)))
    scale = float(jnp.max(jnp.abs(u_ref)))
    log(f"CN fused_hbm vs converged scan maxdiff {diff:.3e} "
        f"(scale {scale:.3e})")


if __name__ == "__main__":
    main()
