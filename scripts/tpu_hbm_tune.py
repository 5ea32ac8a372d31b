"""A/B tuning for the HBM-tiled stripe solver: stripe height and
Chebyshev iteration count at 513^2 and 1025^2, plus iteration-adequacy
diffs against a deep (k=12) reference solve.

Appends rows to results_snapshot/hbm_ab.csv.
"""

import csv
import os
import time

import jax
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.ops import (
    linalg,
    pallas_hbm,
    stencil as stencil_mod,
    uniform as uniform_mod,
)
from functools import partial


def log(*a):
    print(*a, flush=True)


def setup(ms, nt):
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = apt.Problem(sigma=1.0)
    md = apt.MeshData(mesh, domain, nt=nt)
    solver = CRBESolver(domain, problem, md)
    ops = solver.build_global_matrices()
    pattern = stencil_mod.get_pattern(md)
    spec = uniform_mod.build_uniform_spec(pattern)
    perm = jnp.asarray(pattern.perm)
    u0 = solver.set_initial_condition()[perm]
    consts = uniform_mod.extract_constants(spec, ops.system.vals)
    mass_c = uniform_mod.family_constants(spec, ops.mass_diag)
    idc = 1.0 / uniform_mod.family_constants(spec, ops.system_diag)
    matvec = partial(uniform_mod.uniform_matvec, spec, consts)
    bounds = linalg.power_bounds(
        matvec, jnp.zeros_like(u0),
        scale=1.0 / jnp.sqrt(ops.system_diag[perm]),
    )
    return spec, consts, mass_c, idc, u0, bounds


def main():
    log(f"device: {jax.devices()[0]}")
    rows = []
    nt = 1001
    for ms, configs in [
        (513, [(6, 128), (6, 256), (4, 128), (12, 128)]),
        (1025, [(8, 64), (8, 128), (6, 128), (12, 64)]),
    ]:
        spec, consts, mass_c, idc, u0, bounds = setup(ms, nt)
        ref = None
        results = {}
        for k, S in configs:
            fn = jax.jit(lambda u0_, k_=k, S_=S: pallas_hbm.fused_solve_uniform_hbm(
                spec, consts, mass_c, idc, u0_, n_steps=nt - 1,
                n_iters=k_, bounds=bounds, extrapolate=True,
                stripe_rows=S_,
            ))
            t0 = time.time()
            out = fn(u0).block_until_ready()
            log(f"  ms={ms} k={k} S={S}: compile+run {time.time()-t0:.1f}s")
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = fn(u0).block_until_ready()
                best = min(best, time.time() - t0)
            sps = (nt - 1) / best
            results[(k, S)] = (out, sps, best)
            log(f"  ms={ms} k={k} S={S}: {best*1e3:.1f} ms -> {sps:,.0f} steps/s")
        # Adequacy: diff vs the deepest-k run (k=12).
        deep = [key for key in results if key[0] == 12][0]
        ref_out = results[deep][0]
        scale = float(jnp.max(jnp.abs(ref_out)))
        for (k, S), (out, sps, best) in results.items():
            diff = float(jnp.max(jnp.abs(out - ref_out))) / scale
            log(f"  ms={ms} k={k} S={S}: {sps:,.0f} steps/s, "
                f"rel-maxdiff vs k=12: {diff:.2e}")
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
