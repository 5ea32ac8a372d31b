"""Cycling data-assimilation demo: an EnKF forecast–analysis loop over
sequential forecast windows, against a free-running ensemble.

The operational forecasting pattern the restartable ensemble enables
(diagnostics/ensemble.ensemble_forecast ``u0_members``/``t0`` + enkf_update):
a square-pulse release (the "Problem 3" case study,
/root/reference/scripts/problem3.py:30-46) evolves under the TRUE wind
while the forecast ensemble runs with perturbed winds, diffusivities and
initial states. Every ``--window_T`` time units a sparse monitoring
network reports noisy readings of the truth and the ensemble is pulled
toward them with a stochastic EnKF analysis; a twin free-running ensemble
gets no data. One jitted vmapped program serves every window (u0 and t0
are traced arguments), so cycles never recompile. The reference has no
counterpart for any of this (one deterministic solve, crbe.py:406-433).

Writes results_snapshot/da_cycling.csv: per-cycle RMSE of the
forecast/analysis/free ensemble means vs the truth, plus ensemble spread.

    APT_PLATFORM=cpu python scripts/da_cycling_demo.py --mesh_size 24
    python scripts/da_cycling_demo.py                  # TPU
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
from airpollution_tpu.diagnostics import enkf_update, ensemble_forecast
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import SquarePulseProblem


def pulse_field(midpoints, lo, hi, amplitude):
    x, y = midpoints[:, 0], midpoints[:, 1]
    inside = (x >= lo[0]) & (x <= hi[0]) & (y >= lo[1]) & (y <= hi[1])
    return np.where(inside, amplitude, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_size", type=int, default=32)
    ap.add_argument("--members", type=int, default=40)
    ap.add_argument("--cycles", type=int, default=6)
    ap.add_argument("--window_T", type=float, default=1.0)
    ap.add_argument("--window_nt", type=int, default=11)
    ap.add_argument("--sensors", type=int, default=64)
    ap.add_argument("--obs_std", type=float, default=0.02,
                    help="absolute observation noise (pulse amplitude 1)")
    ap.add_argument("--inflation", type=float, default=1.1,
                    help="multiplicative prior inflation (enkf_update)")
    ap.add_argument("--out", default="results_snapshot/da_cycling.csv")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    true_problem = SquarePulseProblem(v=(1.0, 0.5), D=0.1)

    # Truth: one serial solve over the full horizon; cycle-end states are
    # every (window_nt - 1)-th row of the stored trajectory.
    steps_per_window = args.window_nt - 1
    total_T = args.cycles * args.window_T
    dom_full = apt.Domain(T=total_T)
    md_full = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0), dom_full,
                           nt=args.cycles * steps_per_window + 1)
    n = md_full.number_of_segments
    print(f"mesh {args.mesh_size}^2: {n} DOFs, {args.cycles} windows x "
          f"{steps_per_window} steps, K={args.members}, "
          f"m={args.sensors} sensors", file=sys.stderr, flush=True)
    t0 = time.time()
    truth_solver = CRBESolver(dom_full, true_problem, md_full,
                              solver_tol=1e-7, solver_maxiter=200)
    truth = np.asarray(truth_solver.solve(store_solutions=True))
    print(f"truth solve: {time.time() - t0:.1f}s", file=sys.stderr)

    # Forecast window mesh (same spatial grid, one window of time).
    dom_w = apt.Domain(T=args.window_T)
    md_w = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0), dom_w,
                        nt=args.window_nt)
    mids = np.asarray(md_w.midpoints)

    # Perturbed-member problems (wind/diffusivity uncertainty) and
    # perturbed initial states (release location/amplitude uncertainty).
    K = args.members
    probs = [
        SquarePulseProblem(
            v=(1.0 + 0.25 * rng.standard_normal(),
               0.5 + 0.25 * rng.standard_normal()),
            D=0.1 * np.exp(0.3 * rng.standard_normal()),
        )
        for _ in range(K)
    ]
    shifts = 1.5 * rng.standard_normal((K, 2))
    amps = 1.0 + 0.2 * rng.standard_normal(K)
    X0 = np.stack([
        pulse_field(mids, np.array([8.0, 8.0]) + shifts[k],
                    np.array([12.0, 12.0]) + shifts[k], amps[k])
        for k in range(K)
    ])

    # Monitoring network sited along the plume track (source box + one
    # advection length downwind) — stations far from any plume read pure
    # noise and only feed spurious covariances. Realistic siting: networks
    # cluster around known sources.
    track = ((mids[:, 0] >= 5.0) & (mids[:, 0] <= 19.0)
             & (mids[:, 1] >= 5.0) & (mids[:, 1] <= 17.0))
    candidates = np.flatnonzero(track)
    sensors = np.sort(rng.choice(candidates, args.sensors, replace=False))
    key = jax.random.PRNGKey(7)

    X = jnp.asarray(X0)        # assimilated ensemble
    X_free = jnp.asarray(X0)   # twin free run, never analyzed
    rows = []
    t0 = time.time()
    for c in range(args.cycles):
        t_start = c * args.window_T
        out = ensemble_forecast(md_w, dom_w, probs, u0_members=X,
                                t0=t_start)
        out_free = ensemble_forecast(md_w, dom_w, probs, u0_members=X_free,
                                     t0=t_start)
        X_f, X_free = out["members"], out_free["members"]
        u_true = truth[(c + 1) * steps_per_window]

        y = u_true[sensors] + args.obs_std * rng.standard_normal(
            args.sensors)
        key, sub = jax.random.split(key)
        X = enkf_update(X_f, jnp.asarray(y), sensors, args.obs_std, sub,
                        inflation=args.inflation)

        def rmse(m):
            return float(np.sqrt(np.mean(
                (np.asarray(m).mean(axis=0) - u_true) ** 2)))

        spread = float(np.asarray(out["std"]).mean())
        rows.append({
            "cycle": c + 1, "t": (c + 1) * args.window_T,
            "rmse_forecast": rmse(X_f), "rmse_analysis": rmse(X),
            "rmse_free": rmse(X_free), "mean_spread": spread,
        })
        print(f"cycle {c + 1}: forecast {rows[-1]['rmse_forecast']:.5f} "
              f"-> analysis {rows[-1]['rmse_analysis']:.5f} "
              f"(free {rows[-1]['rmse_free']:.5f}, spread {spread:.5f})",
              file=sys.stderr, flush=True)
    cyc_time = time.time() - t0
    print(f"{args.cycles} cycles ({2 * args.cycles} ensemble forecasts + "
          f"{args.cycles} analyses): {cyc_time:.1f}s", file=sys.stderr)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        fields = ["cycle", "t", "rmse_forecast", "rmse_analysis",
                  "rmse_free", "mean_spread"]
        w = csv.DictWriter(f, fieldnames=fields + [
            "mesh_size", "n_dofs", "members", "sensors", "obs_std",
            "platform"])
        w.writeheader()
        for r in rows:
            r = {k: (round(v, 6) if isinstance(v, float) else v)
                 for k, v in r.items()}
            r.update(mesh_size=args.mesh_size, n_dofs=n, members=K,
                     sensors=args.sensors, obs_std=args.obs_std,
                     platform=jax.default_backend())
            w.writerow(r)
    print(f"wrote {args.out}", file=sys.stderr)
    gain = rows[-1]["rmse_free"] / max(rows[-1]["rmse_analysis"], 1e-12)
    print(f"final-cycle error ratio free/analysis = {gain:.2f}x",
          file=sys.stderr)


if __name__ == "__main__":
    main()
