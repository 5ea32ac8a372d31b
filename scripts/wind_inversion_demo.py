"""Wind-field estimation demo: recover the rotation rate of a spatially
varying wind (and the diffusion coefficient) from a sparse sensor network.

Companion to scripts/source_inversion_demo.py on the variable-coefficient
axis: the RotatingPlumeProblem's wind v(x, y) = omega * (-y, x) enters
the FEM operator through the centroid-sampled assembly, so the misfit
gradient differentiates through the coefficient FIELD into every
implicit step — a capability with no counterpart in the reference
(its per-step SuperLU solves are not differentiable at all,
/root/reference/crbe.py:426). Writes results_snapshot/wind_inversion.csv.

    APT_PLATFORM=cpu python scripts/wind_inversion_demo.py --mesh_size 32
    python scripts/wind_inversion_demo.py                  # TPU
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

import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.diagnostics import inverse
from airpollution_tpu.problems import RotatingPlumeProblem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_size", type=int, default=64)
    ap.add_argument("--nt", type=int, default=128)
    ap.add_argument("--sensors", type=int, default=64)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--noise", type=float, default=0.01,
                    help="relative Gaussian sensor noise (1%% default)")
    ap.add_argument("--out", default="results_snapshot/wind_inversion.csv")
    args = ap.parse_args()

    md = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0), apt.Domain(),
                      nt=args.nt)
    n = md.number_of_segments
    print(f"mesh {args.mesh_size}^2: {n} DOFs, nt={args.nt}, "
          f"{args.sensors} sensors", file=sys.stderr, flush=True)

    true = dict(omega=0.15, D=0.08)
    release = dict(sigma=1.5, x0=5.0, y0=0.0)
    idx = list(range(args.nt // 8, args.nt, args.nt // 8)) + [args.nt - 1]
    full = inverse.solve_snapshots(
        RotatingPlumeProblem(**true, **release), md, indices=idx,
        tol=1e-8, maxiter=60)
    rng = np.random.default_rng(0)
    sensors = np.sort(rng.choice(n, args.sensors, replace=False))
    obs = np.asarray(full[:, jnp.asarray(sensors)])
    scale = float(np.abs(obs).max())
    obs = obs + args.noise * scale * rng.standard_normal(obs.shape)

    # The rotation misfit is non-convex (cycle-skipping — see
    # inverse.fit_wind): a coarse omega grid picks the basin, then the
    # adjoint-gradient fit polishes (and jointly estimates D).
    grid = np.linspace(0.0, 0.3, 13)
    t0 = time.time()
    result, losses = inverse.fit_wind(
        jnp.asarray(obs), md, snapshot_indices=idx,
        sensor_indices=sensors, omega_grid=grid, D=0.05,
        fit_diffusion=True, steps=args.steps, lr=args.lr, tol=1e-8,
        maxiter=60, **release)
    fit_time = time.time() - t0
    print(f"grid start: omega0={result['omega0']:.4f} "
          f"(13-candidate coarse search)", file=sys.stderr, flush=True)

    err_om = abs(result["omega"] - true["omega"]) / true["omega"]
    err_d = abs(result["D"] - true["D"]) / true["D"]
    print(f"recovered omega={result['omega']:.5f} (true {true['omega']}, "
          f"rel err {err_om:.2%}), D={result['D']:.5f} (true {true['D']}, "
          f"rel err {err_d:.2%}) [{fit_time:.1f} s / {args.steps} steps]",
          file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        import jax

        w.writerow(["mesh_size", "n_dofs", "nt", "n_sensors",
                    "n_snapshots", "noise_rel", "true_omega", "true_D",
                    "est_omega", "est_D", "omega_rel_err", "D_rel_err",
                    "loss_first", "loss_last", "steps", "fit_time_s",
                    "s_per_step", "platform"])
        w.writerow([args.mesh_size, n, args.nt, args.sensors, len(idx),
                    args.noise, true["omega"], true["D"],
                    round(result["omega"], 6), round(result["D"], 6),
                    round(err_om, 5), round(err_d, 5),
                    f"{losses[0]:.3e}", f"{losses[-1]:.3e}", args.steps,
                    round(fit_time, 2), round(fit_time / args.steps, 4),
                    jax.default_backend()])
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
