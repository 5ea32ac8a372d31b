"""Measure the REFERENCE torch PINN's error baseline (BASELINE.md evidence).

Round-1 judge finding (VERDICT.md Missing #1): BASELINE.md records the
reference PINN's throughput (0.93 epochs/s, CPU) but never its ERRORS, so
the "≥50x epochs/s at L2-error parity" target had only one side measured.
This harness runs the reference implementation (/root/reference/pinn.py)
on the exact pinn_experiments.py per-mesh schedules
(pinn_experiments.py:63-68: neurons [2,4,8,16,32,64], epochs
[500..16000], patience [500x3,1000x3], lr [3e-4,3e-4,2e-4,4e-5,1e-4,1e-4],
lambda=(180,80,80), tanh, width=4) and records rel-L2/L2/max errors per
mesh size into results_snapshot/reference_pinn_errors.csv.

gmsh is unavailable in this environment, so (as for every other baseline
row, BASELINE.md "Measured here") the reference ``MeshData`` is fed an
equivalent in-memory structured triangulation via a meshio-like shim.

This is a measurement harness for the reference code, not part of the
framework. Run: ``python scripts/run_reference_pinn.py --mesh-sizes 4 8 16 32 64``
(expect hours on the single-core host: mesh-64 alone is ~8000 epochs at
~1 epoch/s).
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import types

import numpy as np
import torch

# gmsh and meshio are unavailable here; the reference imports them at
# module top (crbe.py:1,5) but this harness never calls create_mesh, so
# empty stubs suffice.
for _name in ("meshio", "gmsh"):
    if _name not in sys.modules:
        sys.modules[_name] = types.ModuleType(_name)

# pyDOE is also absent (CLAUDE.md env note). The reference uses only
# ``lhs(dim, samples=n)`` (pinn.py:479+). Provide a faithful stand-in:
# classic LHS = stratified uniform samples with independently permuted
# strata per dimension (exactly what pyDOE's default "classic" does,
# up to RNG stream).
if "pyDOE" not in sys.modules:
    _pydoe = types.ModuleType("pyDOE")

    def _lhs(dim, samples):
        rng = np.random
        cut = np.linspace(0, 1, samples + 1)
        u = rng.rand(samples, dim)
        pts = cut[:-1, None] + u * (1.0 / samples)
        for j in range(dim):
            pts[:, j] = pts[rng.permutation(samples), j]
        return pts

    _pydoe.lhs = _lhs
    sys.modules["pyDOE"] = _pydoe

# The reference passes verbose=True to ReduceLROnPlateau (pinn.py:152);
# the installed torch removed that kwarg. Shim it to keep the reference
# source untouched.
_OrigPlateau = torch.optim.lr_scheduler.ReduceLROnPlateau


class _PlateauShim(_OrigPlateau):
    def __init__(self, *a, verbose=None, **kw):
        super().__init__(*a, **kw)


torch.optim.lr_scheduler.ReduceLROnPlateau = _PlateauShim

SCHEDULES = {
    # mesh_size: (n_neurons, epochs, patience, lr)
    4: (2, 500, 500, 3e-4),
    8: (4, 1000, 500, 3e-4),
    16: (8, 2000, 500, 2e-4),
    32: (16, 4000, 1000, 4e-5),
    64: (32, 8000, 1000, 1e-4),
    128: (64, 16000, 1000, 1e-4),
}
WIDTH = 4  # hidden-layer count (pinn_experiments.py:22 naming quirk)
LAMBDA = {"pde": 180.0, "ic": 80.0, "bc": 80.0}
N_STEPS = 128


class _MeshShim:
    """meshio-like object for the reference MeshData (crbe.py:47)."""

    def __init__(self, points, triangles):
        self.points = np.asarray(points, dtype=np.float64)
        self.cells_dict = {"triangle": np.asarray(triangles)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh-sizes", type=int, nargs="+",
                    default=[4, 8, 16, 32, 64])
    ap.add_argument("--out", default="results_snapshot/reference_pinn_errors.csv")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--epochs-cap", type=int, default=None,
                    help="Cap the trained epochs below the per-mesh "
                         "schedule (wall-clock bound: ms=128's scheduled "
                         "16000 epochs is ~12h on this single core). "
                         "epochs_scheduled still records the schedule; "
                         "the measured error is an upper bound on the "
                         "fully-scheduled config's.")
    ap.add_argument("--seed", type=int, default=1234,
                    help="torch/numpy seed (the reference pins 1234 at "
                         "import; the W7 seed-spread study re-runs "
                         "ms=16 across seeds)")
    args = ap.parse_args()

    torch.set_num_threads(args.threads)

    # Structured triangulation from the JAX package (geometry only; the
    # training below is pure reference torch code).
    from airpollution_tpu.mesh.structured import create_mesh

    import crbe  # reference module
    import pinn  # reference module

    # AFTER the reference import: pinn.py re-seeds to 1234 at import
    # time (pinn.py:17-18 side effect) and would silently override a
    # --seed set earlier.
    np.random.seed(args.seed)
    torch.manual_seed(args.seed)

    domain = pinn.Domain()
    problem = pinn.Problem(sigma=1.0)

    fields = ["mesh_size", "n_dofs", "layers", "epochs_scheduled",
              "epochs_run", "rel_l2_error", "l2_error", "max_error",
              "final_loss", "train_time_s", "epochs_per_s", "seed"]
    write_header = not os.path.exists(args.out)
    for ms in args.mesh_sizes:
        neurons, epochs, patience, lr = SCHEDULES[ms]
        m = create_mesh(ms, 20.0)
        shim = _MeshShim(np.asarray(m.points), np.asarray(m.triangles))
        mesh_data = crbe.MeshData(shim, domain, nt=N_STEPS)
        n_col = round(mesh_data.number_of_segments / 1.4)
        n_ic = round(0.2 * n_col)
        batch_sizes = {"pde": n_col, "ic": n_ic, "bc": n_ic}
        layers = [3] + [neurons] * WIDTH + [1]
        model = pinn.PINN(layers, problem, domain, activation="tanh")
        print(f"[reference-pinn] ms={ms}: layers={layers} epochs={epochs} "
              f"lr={lr} n_col={n_col}", flush=True)
        t0 = time.time()
        train_epochs = (min(epochs, args.epochs_cap)
                        if args.epochs_cap else epochs)
        history = model.train(batch_sizes, train_epochs, lr, LAMBDA,
                              early_stopping_patience=patience)
        train_time = time.time() - t0
        epochs_run = len(history["total_loss"])
        rel_l2, l2, mx = model.compute_errors(
            mesh_data, problem.analytical_solution
        )
        row = {
            "mesh_size": ms,
            "n_dofs": mesh_data.number_of_segments,
            "layers": "x".join(map(str, layers)),
            "epochs_scheduled": epochs,
            "epochs_run": epochs_run,
            "rel_l2_error": float(rel_l2),
            "l2_error": float(l2),
            "max_error": float(mx),
            "final_loss": float(history["total_loss"][-1]),
            "train_time_s": round(train_time, 1),
            "epochs_per_s": round(epochs_run / train_time, 3),
            "seed": args.seed,
        }
        print(f"[reference-pinn] ms={ms}: rel_l2={rel_l2:.4f} "
              f"max={mx:.4e} in {train_time:.0f}s "
              f"({row['epochs_per_s']} ep/s)", flush=True)
        with open(args.out, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            if write_header:
                w.writeheader()
                write_header = False
            w.writerow(row)


if __name__ == "__main__":
    main()
