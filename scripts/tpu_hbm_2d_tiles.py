"""2D-tile A/B at 4097^2 (and optionally other sizes): does lane tiling
close the ~2x roofline gap the 1D S=32 stripes leave (judge finding W3)?

Direct-op timing (no solver overhead), k=8, nt=101, extrapolated BE —
the same protocol as scripts/tpu_hbm_4097_stripe.py so rows are
comparable with results_snapshot/hbm_ab.csv. Configs: the round-1 1D
auto pick (S=32 full-lane), taller 1D variants, choose_tile's 2D pick,
and hand
variants around it.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.ops import pallas_hbm, stencil as stencil_mod


def log(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", type=int, default=4097)
    ap.add_argument("--nt", type=int, default=101)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--configs", type=str, default=None,
                    help="comma list of SxSL (SL=0 -> full lanes), "
                         "e.g. 32x0,160x1280; default: auto set")
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")
    ms, nt = args.ms, args.nt
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    solver = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                        solver_method="chebyshev", assembly="patch",
                        extrapolate_warm_start=True,
                        chebyshev_iters=args.k)
    spec, sys_c, _, mass_c, diag_c = solver._patch_pieces()
    solver._check_chebyshev_applicable(None)
    bounds = solver._cheb_bounds
    perm, _ = stencil_mod.get_family_perm(md)
    u0 = solver.set_initial_condition()[jnp.asarray(perm)]
    inv_diag_c = 1.0 / diag_c
    depth = args.k + 1
    halo = -(-(depth + 1) // 8) * 8
    auto = pallas_hbm.choose_tile(ms, True, halo)
    log(f"setup done; bounds {bounds}; auto tile {auto}")

    if args.configs:
        configs = []
        for tok in args.configs.split(","):
            s, sl = tok.split("x")
            configs.append((int(s), int(sl) or None))
    else:
        configs = [(32, None), (64, None), auto,
                   (128, 2048), (256, 1024), (96, 1280)]

    ref = None
    for S, SL in configs:
        fn = jax.jit(
            lambda u0_, S_=S, SL_=SL: pallas_hbm.fused_solve_uniform_hbm(
                spec, sys_c, mass_c, inv_diag_c, u0_, n_steps=nt - 1,
                n_iters=args.k, bounds=bounds, extrapolate=True,
                stripe_rows=S_, stripe_lanes=SL_,
            ))
        try:
            t0 = time.time()
            out = fn(u0).block_until_ready()
            log(f"  S={S} SL={SL}: compile+run {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001 — scheduling probes
            log(f"  S={S} SL={SL}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")
            continue
        if ref is None:
            ref = out
            diff = 0.0
        else:
            diff = float(jnp.max(jnp.abs(out - ref)))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(u0).block_until_ready()
            best = min(best, time.time() - t0)
        log(f"  S={S} SL={SL}: {best*1e3:.1f} ms -> "
            f"{(nt-1)/best:,.0f} steps/s (maxdiff vs first {diff:.2e})")


if __name__ == "__main__":
    main()
