"""Ensemble forecast demo: exceedance probabilities under uncertain
transport parameters.

Integrates a K-member ensemble of Gaussian-plume problems with perturbed
wind and eddy diffusivity (lognormal D, Gaussian v — the standard
operational perturbation model) in ONE vmapped solve
(diagnostics/ensemble.ensemble_forecast), and validates the products
against the closed form: each member has an exact solution, so the true
ensemble mean/exceedance are computable analytically — the demo reports
the FEM-ensemble vs analytic-ensemble discrepancy alongside wall-clock
for the batched solve vs a sequential member loop.

Writes results_snapshot/ensemble.csv.

    APT_PLATFORM=cpu python scripts/ensemble_demo.py
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
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.diagnostics import ensemble_forecast
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import Domain, Problem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=32)
    ap.add_argument("--mesh_size", type=int, default=32)
    ap.add_argument("--nt", type=int, default=65)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results_snapshot", "ensemble.csv"))
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    domain = Domain(T=5.0)
    md = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0), domain,
                      nt=args.nt, dtype=jnp.float64)

    # Perturbation model: lognormal D (30% spread) around 0.1, Gaussian
    # wind around (1.0, 0.5) with sigma 0.15 per component.
    Ds = np.exp(rng.normal(np.log(0.1), 0.3, args.members))
    Vs = rng.normal([1.0, 0.5], 0.15, (args.members, 2))
    problems = [Problem(v=tuple(v), D=float(d)) for v, d in zip(Vs, Ds)]
    taus = (0.01, 0.03, 0.06)

    t0 = time.time()
    out = ensemble_forecast(md, domain, problems, order=2,
                            thresholds=taus)
    jax.block_until_ready(out["members"])
    t_batched = time.time() - t0
    # Warm second call (same jitted program) for the honest number.
    t0 = time.time()
    out = ensemble_forecast(md, domain, problems, order=2,
                            thresholds=taus)
    jax.block_until_ready(out["members"])
    t_warm = time.time() - t0

    # Sequential member loop (one compiled program, K launches) for the
    # batching speedup.
    s = CRBESolver(domain, problems[0], md, time_scheme_order=2,
                   matvec_impl="ell")
    s.solve(store_solutions=False)
    t0 = time.time()
    for p in problems:
        s2 = CRBESolver(domain, p, md, time_scheme_order=2,
                        matvec_impl="ell")
        s2._solve_fn_cache = s._solve_fn_cache  # share the compiled fn
        s2.solve(store_solutions=False)
    t_seq = time.time() - t0

    # Analytic ensemble products (each member has a closed form).
    xyt = jnp.concatenate(
        [md.midpoints,
         jnp.full((md.number_of_segments, 1), domain.T, jnp.float64)],
        axis=1)
    exact = jnp.stack([p.analytical_solution(xyt) for p in problems])
    mean_err = float(jnp.linalg.norm(out["mean"] - exact.mean(0))
                     / jnp.linalg.norm(exact.mean(0)))
    rows = []
    for i, tau in enumerate(taus):
        exc_fem = np.asarray(out["exceedance"][i])
        exc_true = np.asarray((exact > tau).mean(0))
        rows.append({
            "threshold": tau,
            "fem_exceedance_mean": float(exc_fem.mean()),
            "analytic_exceedance_mean": float(exc_true.mean()),
            "max_prob_disagreement": float(np.abs(exc_fem - exc_true).max()),
        })

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        wcsv = csv.writer(f)
        wcsv.writerow(["members", "mesh_size", "nt", "threshold",
                       "fem_exceedance_mean", "analytic_exceedance_mean",
                       "max_prob_disagreement", "ensemble_mean_rel_l2",
                       "t_batched_warm_s", "t_sequential_s", "speedup"])
        for r in rows:
            wcsv.writerow([args.members, args.mesh_size, args.nt,
                           r["threshold"], f"{r['fem_exceedance_mean']:.6f}",
                           f"{r['analytic_exceedance_mean']:.6f}",
                           f"{r['max_prob_disagreement']:.6f}",
                           f"{mean_err:.6f}", f"{t_warm:.3f}",
                           f"{t_seq:.3f}", f"{t_seq / t_warm:.2f}"])
    print(f"ensemble of {args.members}: mean-field rel-L2 vs analytic "
          f"ensemble {mean_err:.4f}")
    for r in rows:
        print(f"  tau={r['threshold']}: P_exc fem {r['fem_exceedance_mean']:.4f} "
              f"vs analytic {r['analytic_exceedance_mean']:.4f} "
              f"(max pointwise prob diff {r['max_prob_disagreement']:.3f})")
    print(f"batched warm {t_warm:.3f} s vs sequential {t_seq:.3f} s "
          f"(x{t_seq / t_warm:.1f}); first-call (compile) {t_batched:.3f} s")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
