"""TPU inverse-problem demo: recover D and v from solution snapshots.

Runs the differentiable CRBE solve (diagnostics/inverse.py) at the study's
working resolution (64^2 mesh, nt=128): generates a synthetic observed
trajectory (7 snapshots) with hidden parameters, then recovers (D, v)
jointly by Adam on the adjoint gradients. Final-time-only observations
under-determine the joint problem (measured: D drifted to 0.44, v
diverged); trajectory snapshots pin the advection velocity. Writes
results_snapshot/inverse_demo.csv.

    python scripts/tpu_inverse_demo.py
"""

import csv
import os
import sys
import time

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import airpollution_tpu as apt
from airpollution_tpu.diagnostics import inverse
from airpollution_tpu.problems import Problem


def main():
    md = apt.MeshData(apt.create_mesh(64, 20.0), apt.Domain(), nt=128)
    print(f"mesh 64^2: {md.number_of_segments} DOFs, nt=128",
          file=sys.stderr, flush=True)

    true = {"D": 0.25, "v": (0.8, 0.6)}
    idx = list(range(16, 128, 16)) + [127]
    u_obs = inverse.solve_snapshots(
        Problem(v=true["v"], D=true["D"]), md, indices=idx,
        tol=1e-8, maxiter=60,
    )

    def make_problem(params):
        return Problem(v=params["v"], D=jnp.exp(params["log_d"]))

    init = {"log_d": jnp.log(jnp.asarray(0.05)),
            "v": jnp.asarray([1.5, -0.2])}
    # Warm-up: compile the forward+adjoint step (CLAUDE.md rule — never
    # time a fresh compile); cache_key makes the timed run reuse it.
    key = ("inverse-demo", 64)
    inverse.fit_parameters(u_obs, md, make_problem, init,
                           snapshot_indices=idx, steps=1, lr=0.05,
                           tol=1e-8, maxiter=60, cache_key=key)
    t0 = time.time()
    params, losses = inverse.fit_parameters(
        u_obs, md, make_problem, init, snapshot_indices=idx,
        steps=150, lr=0.05, tol=1e-8, maxiter=60, cache_key=key,
    )
    wall = time.time() - t0
    D_est = float(jnp.exp(params["log_d"]))
    v_est = [float(x) for x in params["v"]]
    row = {
        "n_dofs": md.number_of_segments, "nt": 128, "steps": 150,
        "wall_s": round(wall, 1), "s_per_adam_step": round(wall / 150, 3),
        "D_true": true["D"], "D_est": round(D_est, 5),
        "vx_true": true["v"][0], "vx_est": round(v_est[0], 5),
        "vy_true": true["v"][1], "vy_est": round(v_est[1], 5),
        "loss_first": losses[0], "loss_last": losses[-1],
    }
    print(row, file=sys.stderr, flush=True)

    out = "results_snapshot/inverse_demo.csv"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row))
        w.writeheader()
        w.writerow(row)
    print(f"saved {out}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
