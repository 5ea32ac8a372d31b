"""Stripe-height probe at 4097^2: does S=64 (scoped-VMEM request ~59 MB)
schedule, and what does it buy over the auto-chosen S=32 (2x halo
redundancy)? Direct-op timing, k=8, nt=101."""

import time

import jax
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.ops import pallas_hbm, stencil as stencil_mod


def log(*a):
    print(*a, flush=True)


def main():
    log(f"device: {jax.devices()[0]}")
    ms, nt = 4097, 101
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    solver = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                        solver_method="chebyshev", assembly="patch",
                        extrapolate_warm_start=True, chebyshev_iters=8)
    spec, sys_c, _, mass_c, diag_c = solver._patch_pieces()
    solver._check_chebyshev_applicable(None)
    bounds = solver._cheb_bounds
    perm, _ = stencil_mod.get_family_perm(md)
    u0 = solver.set_initial_condition()[jnp.asarray(perm)]
    inv_diag_c = 1.0 / diag_c
    log(f"setup done; bounds {bounds}")

    for S in (32, 64, 96):
        fn = jax.jit(lambda u0_, S_=S: pallas_hbm.fused_solve_uniform_hbm(
            spec, sys_c, mass_c, inv_diag_c, u0_, n_steps=nt - 1,
            n_iters=8, bounds=bounds, extrapolate=True, stripe_rows=S_,
        ))
        try:
            t0 = time.time()
            out = fn(u0).block_until_ready()
            log(f"  S={S}: compile+run {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001 — scheduling probes
            log(f"  S={S}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = fn(u0).block_until_ready()
            best = min(best, time.time() - t0)
        log(f"  S={S}: {best*1e3:.1f} ms -> {(nt-1)/best:,.0f} steps/s")


if __name__ == "__main__":
    main()
