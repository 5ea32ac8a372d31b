"""Stripe-height / iteration A/B at 2049^2 (patch assembly — the global
operator cannot be assembled at this size). Appends to
results_snapshot/hbm_ab.csv."""

import csv
import os
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
    ms, nt = 2049, 1001
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    solver = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                        solver_method="chebyshev", assembly="patch",
                        extrapolate_warm_start=True)
    spec, sys_c, _, mass_c, diag_c = solver._patch_pieces()
    solver._check_chebyshev_applicable(None)
    bounds = solver._cheb_bounds
    perm, _ = stencil_mod.get_family_perm(md)
    u0 = solver.set_initial_condition()[jnp.asarray(perm)]
    inv_diag_c = 1.0 / diag_c
    log(f"setup done; bounds {bounds}")

    rows, results = [], {}
    for k, S in [(10, 96), (10, 128), (12, 128)]:
        fn = jax.jit(lambda u0_, k_=k, S_=S: pallas_hbm.fused_solve_uniform_hbm(
            spec, sys_c, mass_c, inv_diag_c, u0_, n_steps=nt - 1,
            n_iters=k_, bounds=bounds, extrapolate=True, stripe_rows=S_,
        ))
        try:
            t0 = time.time()
            out = fn(u0).block_until_ready()
            log(f"  k={k} S={S}: compile+run {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001 — VMEM overflow probes
            log(f"  k={k} S={S}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = fn(u0).block_until_ready()
            best = min(best, time.time() - t0)
        sps = (nt - 1) / best
        results[(k, S)] = (out, sps, best)
        log(f"  k={k} S={S}: {best*1e3:.1f} ms -> {sps:,.0f} steps/s")

    deep = [key for key in results if key[0] == 12 and key[1] == 128]
    ref_out = results[deep[0]][0] if deep else None
    scale = float(jnp.max(jnp.abs(ref_out))) if deep else 1.0
    for (k, S), (out, sps, best) in results.items():
        diff = (float(jnp.max(jnp.abs(out - ref_out))) / scale
                if deep else float("nan"))
        log(f"  k={k} S={S}: {sps:,.0f} steps/s, rel-maxdiff vs k=12: "
            f"{diff:.2e}")
        rows.append(dict(ms=ms, nt=nt, k=k, stripe=S,
                         steps_per_sec=round(sps, 1),
                         ms_per_solve=round(best * 1e3, 2),
                         reldiff_vs_k12=f"{diff:.3e}"))

    if not rows:
        log("no configs succeeded; nothing to write")
        return
    path = "results_snapshot/hbm_ab.csv"
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        if not exists:
            w.writeheader()
        w.writerows(rows)
    log(f"wrote {len(rows)} rows to {path}")


if __name__ == "__main__":
    main()
