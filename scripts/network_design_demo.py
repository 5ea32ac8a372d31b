"""Monitoring-network design demo: greedy EnSRF sensor placement vs
random networks, scored by actual EnKF analysis skill.

The observing-system-design loop the ensemble machinery closes
(diagnostics/ensemble.place_sensors -> enkf_update): forecast an
uncertain-transport ensemble, greedily site stations where observing the
ensemble buys the most expected analysis-variance reduction (square-root
rank-one deflation between picks, Whitaker & Hamill 2002), then verify
the payoff by assimilating noisy truth readings through each candidate
network and comparing analysis-mean errors. The reference has no
observing-system machinery at all. Writes
results_snapshot/network_design.csv.

    APT_PLATFORM=cpu python scripts/network_design_demo.py
"""

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("APT_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.diagnostics import (
    enkf_update,
    ensemble_forecast,
    place_sensors,
)
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import Problem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_size", type=int, default=24)
    ap.add_argument("--nt", type=int, default=33)
    ap.add_argument("--members", type=int, default=32)
    ap.add_argument("--sizes", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--random_trials", type=int, default=5)
    ap.add_argument("--obs_std", type=float, default=0.002)
    ap.add_argument("--out", default="results_snapshot/network_design.csv")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    domain = apt.Domain()
    md = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0), domain,
                      nt=args.nt)
    n = md.number_of_segments
    truth_problem = Problem(v=(1.0, 0.5), D=0.25)
    truth = np.asarray(
        CRBESolver(domain, truth_problem, md,
                   matvec_impl="ell").solve(store_solutions=False)[0])

    # Uncertain-transport forecast ensemble bracketing the truth.
    t0 = time.time()
    probs = [Problem(v=(1.0 + 0.15 * rng.standard_normal(),
                        0.5 + 0.15 * rng.standard_normal()),
                     D=float(np.exp(rng.normal(np.log(0.18), 0.5))))
             for _ in range(args.members)]
    X = ensemble_forecast(md, domain, probs)["members"]
    print(f"mesh {args.mesh_size}^2 ({n} DOFs), K={args.members} "
          f"forecast: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    err_prior = float(np.linalg.norm(np.asarray(X).mean(0) - truth))

    def analysis_err(sensors, key):
        y = truth[np.asarray(sensors)] + rng.normal(
            0, args.obs_std, len(sensors))
        Xa = enkf_update(X, jnp.asarray(y), [int(i) for i in sensors],
                         args.obs_std, key)
        return float(np.linalg.norm(np.asarray(Xa).mean(0) - truth))

    rows = []
    greedy_all, reds = place_sensors(X, max(args.sizes),
                                     obs_std=args.obs_std)
    for m in args.sizes:
        e_greedy = analysis_err(greedy_all[:m], jax.random.PRNGKey(0))
        e_rand = [analysis_err(
            rng.choice(n, m, replace=False), jax.random.PRNGKey(k + 1))
            for k in range(args.random_trials)]
        rows.append({
            "n_sensors": m,
            "err_prior": round(err_prior, 6),
            "err_greedy": round(e_greedy, 6),
            "err_random_mean": round(float(np.mean(e_rand)), 6),
            "err_random_best": round(float(np.min(e_rand)), 6),
            "greedy_over_random": round(float(np.mean(e_rand)) / e_greedy,
                                        3),
            "expected_var_reduction": round(float(np.sum(reds[:m])), 6),
        })
        print(f"m={m}: greedy {e_greedy:.5f} vs random "
              f"{np.mean(e_rand):.5f} (best {np.min(e_rand):.5f}) "
              f"[prior {err_prior:.5f}]", file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]) + [
            "mesh_size", "n_dofs", "members", "obs_std", "platform"])
        w.writeheader()
        for r in rows:
            r.update(mesh_size=args.mesh_size, n_dofs=n,
                     members=args.members, obs_std=args.obs_std,
                     platform=jax.default_backend())
            w.writerow(r)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
