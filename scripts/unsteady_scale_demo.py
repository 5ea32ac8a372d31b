"""Time-varying wind at production scale: fused quasi-static chunks.

The storm-passage configuration: a veering wind (TurningWindProblem —
constant speed, direction rotating in time) makes the operator
time-dependent, so CRBESolver's assemble-once contract does not apply;
models/unsteady.solve_time_varying reassembles at each chunk's midpoint
time and (matvec_impl='fused_hbm') runs every chunk on the canvas
stripe kernel — per-chunk coefficient extraction + spectral-interval
re-estimation + the fused sweep, all inside ONE jitted chunk program.

Per mesh size: warm steps/s (including the per-chunk reassembly — the
real quasi-static cost), and a reassembly-frequency consistency check
(halving reassemble_every should change the answer at the quadrature
order, not the solver level). Writes
results_snapshot/unsteady_scale.json (--write).
"""

import argparse
import json
import os
import time

import numpy as np

if os.environ.get("APT_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax

import airpollution_tpu as apt
from airpollution_tpu.models.unsteady import solve_time_varying
from airpollution_tpu.problems import TurningWindProblem


def log(*a):
    print(*a, flush=True)


FROZEN_BOUNDS = False


def run(ms, nt, every, iters, warm=True):
    domain = apt.Domain()
    md = apt.MeshData(apt.create_mesh(ms, domain.Lx), domain, nt=nt)
    p = TurningWindProblem(speed=1.0, omega_t=0.5, D=0.3)
    out = {"mesh_size": ms, "n_dofs": int(md.number_of_segments),
           "nt": nt, "reassemble_every": every,
           "chebyshev_iters": iters, "scheme": "crank-nicolson",
           "frozen_bounds": FROZEN_BOUNDS}
    kw = dict(reassemble_every=every, time_scheme_order=2,
              chebyshev_iters=iters, extrapolate_warm_start=True,
              store_solutions=False, matvec_impl="fused_hbm",
              reestimate_bounds=not FROZEN_BOUNDS)
    t0 = time.time()
    u = solve_time_varying(p, md, **kw)
    u.block_until_ready()
    log(f"[{ms}^2] first solve (compile+run) {time.time()-t0:.1f}s "
        f"({(nt-1)//every} chunks)")
    if warm:
        t0 = time.time()
        u = solve_time_varying(p, md, **kw)
        u.block_until_ready()
        dt_w = time.time() - t0
        out["warm_solve_s"] = dt_w
        out["steps_per_sec"] = (nt - 1) / dt_w
        log(f"[{ms}^2] warm {dt_w:.3f}s -> {(nt-1)/dt_w:.0f} steps/s "
            f"(incl. {(nt-1)//every} reassemblies)")
    un = np.asarray(u)[0]
    assert np.isfinite(un).all(), "diverged"
    out["final_max"] = float(np.abs(un).max())

    # Reassembly-frequency consistency: halving the chunk length moves
    # the answer by the midpoint-quadrature increment only.
    kw2 = dict(kw, reassemble_every=every // 2)
    u2 = solve_time_varying(p, md, **kw2)
    u2.block_until_ready()
    d = float(np.abs(np.asarray(u2)[0] - un).max() / np.abs(un).max())
    out["halved_chunk_rel_maxdiff"] = d
    log(f"[{ms}^2] halving reassemble_every: rel maxdiff {d:.2e}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_sizes", type=int, nargs="+",
                    default=[513, 1025])
    ap.add_argument("--nt", type=int, nargs="+", default=[1001, 2001])
    ap.add_argument("--reassemble_every", type=int, nargs="+",
                    default=[50, 100])
    ap.add_argument("--chebyshev_iters", type=int, default=8)
    ap.add_argument("--frozen_bounds", action="store_true",
                    help="reestimate_bounds=False: one widened "
                    "mid-horizon spectral interval for every chunk "
                    "(exact for speed-preserving winds)")
    ap.add_argument("--no_warm", action="store_true")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    log(f"backend: {jax.default_backend()}")
    global FROZEN_BOUNDS
    FROZEN_BOUNDS = args.frozen_bounds
    path = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "results_snapshot",
        "unsteady_scale.json"))
    for ms, nt, ev in zip(args.mesh_sizes, args.nt,
                          args.reassemble_every, strict=True):
        row = run(ms, nt, ev, args.chebyshev_iters,
                  warm=not args.no_warm)
        if args.write:
            old = []
            if os.path.exists(path):
                with open(path) as f:
                    old = json.load(f)
            merged = {r["mesh_size"]: r for r in old}
            merged[row["mesh_size"]] = row
            with open(path, "w") as f:
                json.dump(sorted(merged.values(),
                                 key=lambda r: r["mesh_size"]),
                          f, indent=1)
            log(f"wrote {path} (+{ms})")


if __name__ == "__main__":
    main()
