"""Extrapolated-warm-start A/B for the differentiable fused fits
(judge W4 round 4).

Round 4 proved the delta-trick extrapolation exactly matches the
kernel's in-kernel ordering (tests/test_fused_adjoint.py) but left it
unwired in diagnostics/inverse — every fit paid the cold-start
iteration count per Adam step. This measures, at the
source_inversion_513.csv configuration (513^2, nt=128, fused
differentiable engine):

- primal accuracy of the fixed-k Chebyshev solve vs a tight scan
  reference, for (extrapolate, k) in {False, True} x {12, 8};
- warm per-Adam-step wall-clock of fit_source for each config.

The decision rule: if (True, 8) matches (False, 12)'s accuracy, the
warm start buys ~k/12 of every fit's wall-clock for free and the
inverse-fit defaults flip. Writes results_snapshot/extrapolate_ab.csv.

    python scripts/extrapolate_ab.py            # TPU
    APT_PLATFORM=cpu python scripts/extrapolate_ab.py --mesh_size 33
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
from airpollution_tpu.diagnostics import inverse
from airpollution_tpu.problems import GaussianSourceProblem


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_size", type=int, default=513)
    ap.add_argument("--nt", type=int, default=128)
    ap.add_argument("--sensors", type=int, default=96)
    ap.add_argument("--timed_steps", type=int, default=20)
    ap.add_argument("--out",
                    default="results_snapshot/extrapolate_ab.csv")
    args = ap.parse_args()

    md = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0),
                      apt.Domain(), nt=args.nt)
    n = md.number_of_segments
    log(f"mesh {args.mesh_size}^2: {n} DOFs, nt={args.nt}")
    true = dict(q=2.0, xs=-4.0, ys=2.5, sigma_s=1.5)
    p = GaussianSourceProblem(**true)

    t0 = time.time()
    tight = inverse.solve_final_state(p, md, engine="scan", tol=1e-8,
                                      maxiter=200)
    tight.block_until_ready()
    log(f"tight scan reference: {time.time() - t0:.1f}s")
    tight_n = np.asarray(tight)
    scale = np.abs(tight_n).max()

    idx = list(range(args.nt // 8, args.nt, args.nt // 8)) + [args.nt - 1]
    full = inverse.solve_snapshots(p, md, indices=idx, engine="fused_hbm",
                                   chebyshev_iters=12)
    rng = np.random.default_rng(0)
    sensors = np.sort(rng.choice(n, args.sensors, replace=False))
    obs = np.asarray(full[:, jnp.asarray(sensors)])
    obs = obs + 0.01 * np.abs(obs).max() * rng.standard_normal(obs.shape)
    obs = jnp.asarray(obs)

    rows = []
    for ex in (False, True):
        for k in (12, 8):
            u = inverse.solve_final_state(p, md, engine="fused_hbm",
                                          chebyshev_iters=k,
                                          extrapolate=ex)
            acc = float(np.abs(np.asarray(u) - tight_n).max() / scale)

            kw = dict(snapshot_indices=idx, sensor_indices=sensors,
                      sigma_s=true["sigma_s"], q0=0.5, xy0=(0.0, 0.0),
                      lr=0.1, tol=1e-8, maxiter=60,
                      engine="fused_hbm", chebyshev_iters=k,
                      extrapolate=ex, cache_key=f"ab_{ex}_{k}")
            # Warm the compiled step, then time.
            inverse.fit_source(obs, md, steps=2, **kw)
            t0 = time.time()
            _, losses = inverse.fit_source(obs, md,
                                           steps=args.timed_steps, **kw)
            spas = (time.time() - t0) / args.timed_steps
            rows.append({
                "mesh_size": args.mesh_size, "nt": args.nt,
                "extrapolate": ex, "chebyshev_iters": k,
                "primal_rel_maxdiff_vs_tight": f"{acc:.3e}",
                "s_per_adam_step": round(spas, 4),
                "loss_last": f"{losses[-1]:.3e}",
                "platform": jax.default_backend(),
            })
            log(f"extrapolate={ex} k={k}: primal {acc:.2e}, "
                f"{spas:.3f} s/Adam-step")

    outp = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                        args.out))
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    log(f"wrote {outp}")


if __name__ == "__main__":
    main()
