"""Accuracy-lever study: beyond-reference PINN training options on TPU.

Trains the mesh-64 reference configuration (pinn_experiments.py:63-68
schedule: 32 neurons x 4 hidden layers, lr 1e-4, lambda=(180,80,80),
n_col = round(ndof/1.4)) under combinations of the three accuracy levers
this framework adds over the reference:

- fourier:  random Fourier feature embedding (fourier_features=64)
- rad:      residual-based adaptive collocation (adaptive_oversample=3)
- adaptive: grad-norm self-adaptive loss weights (every 100 epochs)
- hardic:   hard initial-condition ansatz u0 + (t/T) NN (exact IC)

Writes results_snapshot/pinn_accuracy_levers.csv with rel-L2/max errors at
t=T on the mesh-64 midpoints and epochs/s. Run on TPU in the background
(each variant is its own compile, ~1-7 min first touch):

    python scripts/pinn_accuracy_levers.py [--epochs 4000]
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import configure_platform

configure_platform()  # APT_PLATFORM=cpu for dev-loop smokes

import airpollution_tpu as apt
from airpollution_tpu.models.pinn import PINN


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--mesh_size", type=int, default=64)
    ap.add_argument("--variants", type=str, nargs="*", default=None,
                    help="Subset of variant names to run (default: all)")
    ap.add_argument("--out", default="results_snapshot/pinn_accuracy_levers.csv")
    ap.add_argument("--skip_existing", action="store_true",
                    help="Skip variants already in --out at this mesh "
                         "size (cheap resume after a tunnel drop)")
    args = ap.parse_args(argv)

    domain, problem = apt.Domain(), apt.Problem()
    md = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0), domain, nt=128)
    n_col = round(md.number_of_segments / 1.4)
    n_ic = round(0.2 * n_col)
    batch = {"pde": n_col, "ic": n_ic, "bc": n_ic}
    lambdas = {"pde": 180.0, "ic": 80.0, "bc": 80.0}
    layers = [3] + [32] * 4 + [1]
    print(f"mesh-64 config: n_col={n_col}, layers={layers}, "
          f"epochs={args.epochs}", file=sys.stderr, flush=True)

    flat = {"pde": 1.0, "ic": 1.0, "bc": 1.0}
    variants = {
        "base": {},
        "fourier": {"ff": 64},
        "rad": {"rad": 3.0},
        "adaptive": {"aw": 100},
        "fourier+rad": {"ff": 64, "rad": 3.0},
        "all": {"ff": 64, "rad": 3.0, "aw": 100},
        "hardic": {"hic": True},
        "fourier+hardic": {"ff": 64, "hic": True},
        "fourier+rad+hardic": {"ff": 64, "rad": 3.0, "hic": True},
        "causal": {"ce": 1.0},
        "fourier+causal": {"ff": 64, "ce": 1.0},
        "fourier+causal10": {"ff": 64, "ce": 10.0},
        "fourier+causal+hardic": {"ff": 64, "ce": 1.0, "hic": True},
        "fourier+causal+wide": {"ff": 64, "ce": 1.0,
                                "layers": [3] + [64] * 4 + [1],
                                "lr": 1e-3},
        "fourier+wide": {"ff": 64, "layers": [3] + [64] * 4 + [1],
                         "lr": 1e-3},
        "fourier+wide128": {"ff": 128, "layers": [3] + [128] * 4 + [1],
                            "lr": 1e-3},
        "fourier+wide-long": {"ff": 64, "layers": [3] + [64] * 4 + [1],
                              "lr": 1e-3, "epochs": 16000, "patience": 2000},
        "fourier+causal+wide-long": {"ff": 64, "ce": 1.0,
                                     "layers": [3] + [64] * 4 + [1],
                                     "lr": 1e-3, "epochs": 16000,
                                     "patience": 2000},
        "fourier+rad+wide-long": {"ff": 64, "rad": 3.0,
                                  "layers": [3] + [64] * 4 + [1],
                                  "lr": 1e-3, "epochs": 16000,
                                  "patience": 2000},
        "fourier+causal+wide128-long": {"ff": 128, "ce": 1.0,
                                        "layers": [3] + [128] * 4 + [1],
                                        "lr": 1e-3, "epochs": 32000,
                                        "patience": 4000},
        "fourier+causal+wide-xlong": {"ff": 64, "ce": 1.0,
                                      "layers": [3] + [64] * 4 + [1],
                                      "lr": 1e-3, "epochs": 64000,
                                      "patience": 8000},
        "fourier+causal+rad+wide-long": {"ff": 64, "ce": 1.0, "rad": 3.0,
                                         "layers": [3] + [64] * 4 + [1],
                                         "lr": 1e-3, "epochs": 16000,
                                         "patience": 2000},
        "fourier+causal+wide+lbfgs": {"ff": 64, "ce": 1.0,
                                      "layers": [3] + [64] * 4 + [1],
                                      "lr": 1e-3, "epochs": 16000,
                                      "patience": 2000, "lbfgs": 1000},
        # min_delta matters: the default 1e-6 exceeds these runs' final
        # losses (~2e-7), so "patience" fires as soon as the easy phase
        # ends and the long schedules never actually run long.
        "fourier+causal+wide-64k": {"ff": 64, "ce": 1.0,
                                    "layers": [3] + [64] * 4 + [1],
                                    "lr": 1e-3, "epochs": 64000,
                                    "patience": 8000, "min_delta": 1e-9,
                                    "lbfgs": 1000},
        "fourier+wide+lbfgs": {"ff": 64,
                               "layers": [3] + [64] * 4 + [1],
                               "lr": 1e-3, "epochs": 16000,
                               "patience": 2000, "lbfgs": 1000},
        # Untuned-weights pair: the annealing scheme's intended use case.
        "base-flat-lambdas": {"lambdas": flat},
        "adaptive-flat-lambdas": {"aw": 100, "lambdas": flat},
        # E6 --search_levers best trial (optuna_pinn_results_64.csv #11):
        # plain wide net, lr 2.19e-3, lambda_pde 10 / lambda_ic_bc 0.14 —
        # the loss-weight ratio matters more than any single lever at a
        # fixed budget.
        "hpo-tuned": {"layers": [3] + [64] * 4 + [1], "lr": 2.19e-3,
                      "lambdas": {"pde": 10.0, "ic": 0.14, "bc": 0.14}},
        "hpo-tuned-64k": {"layers": [3] + [64] * 4 + [1], "lr": 2.19e-3,
                          "lambdas": {"pde": 10.0, "ic": 0.14, "bc": 0.14},
                          "epochs": 64000, "patience": 8000,
                          "min_delta": 1e-9, "lbfgs": 1000},
        "hpo-tuned+fourier+causal-64k": {
            "ff": 64, "ce": 1.0,
            "layers": [3] + [64] * 4 + [1], "lr": 2.19e-3,
            "lambdas": {"pde": 10.0, "ic": 0.14, "bc": 0.14},
            "epochs": 64000, "patience": 8000, "min_delta": 1e-9,
            "lbfgs": 1000},
        "hpo-tuned+fourier+causal+wide128-64k": {
            "ff": 128, "ce": 1.0,
            "layers": [3] + [128] * 4 + [1], "lr": 1e-3,
            "lambdas": {"pde": 10.0, "ic": 0.14, "bc": 0.14},
            "epochs": 64000, "patience": 8000, "min_delta": 1e-9,
            "lbfgs": 1000},
        # Round-2 screening around the 0.407 winner (fourier+causal+wide):
        # fourier_scale, activation, depth, and collocation-batch levers at
        # a 16k-epoch budget; winners get promoted to the 64k schedule.
        "fcw-scale0.5-16k": {"ff": 64, "ce": 1.0, "scale": 0.5,
                             "layers": [3] + [64] * 4 + [1], "lr": 1e-3,
                             "epochs": 16000, "patience": 2000,
                             "min_delta": 1e-9},
        "fcw-scale2-16k": {"ff": 64, "ce": 1.0, "scale": 2.0,
                           "layers": [3] + [64] * 4 + [1], "lr": 1e-3,
                           "epochs": 16000, "patience": 2000,
                           "min_delta": 1e-9},
        "fcw-scale4-16k": {"ff": 64, "ce": 1.0, "scale": 4.0,
                           "layers": [3] + [64] * 4 + [1], "lr": 1e-3,
                           "epochs": 16000, "patience": 2000,
                           "min_delta": 1e-9},
        "fcw-sine-16k": {"ff": 64, "ce": 1.0, "act": "sine",
                         "layers": [3] + [64] * 4 + [1], "lr": 1e-3,
                         "epochs": 16000, "patience": 2000,
                         "min_delta": 1e-9},
        "sine-wide-16k": {"ce": 1.0, "act": "sine",
                          "layers": [3] + [64] * 4 + [1], "lr": 1e-3,
                          "epochs": 16000, "patience": 2000,
                          "min_delta": 1e-9},
        "fcw-deep6-16k": {"ff": 64, "ce": 1.0,
                          "layers": [3] + [64] * 6 + [1], "lr": 1e-3,
                          "epochs": 16000, "patience": 2000,
                          "min_delta": 1e-9},
        "fcw-batch2x-16k": {"ff": 64, "ce": 1.0, "batch_mult": 2,
                            "layers": [3] + [64] * 4 + [1], "lr": 1e-3,
                            "epochs": 16000, "patience": 2000,
                            "min_delta": 1e-9},
        "fcw-batch4x-16k": {"ff": 64, "ce": 1.0, "batch_mult": 4,
                            "layers": [3] + [64] * 4 + [1], "lr": 1e-3,
                            "epochs": 16000, "patience": 2000,
                            "min_delta": 1e-9},
    }

    if args.variants:
        unknown = set(args.variants) - set(variants)
        if unknown:
            raise SystemExit(f"unknown variants {sorted(unknown)}")
        variants = {k: v for k, v in variants.items() if k in args.variants}

    if args.skip_existing and os.path.exists(args.out):
        with open(args.out, newline="") as f:
            done = {(r["variant"], r.get("mesh_size") or "64")
                    for r in csv.DictReader(f)}
        skipped = [k for k in variants
                   if (k, str(args.mesh_size)) in done]
        if skipped:
            print(f"skip_existing: {skipped}", file=sys.stderr, flush=True)
        variants = {k: v for k, v in variants.items() if k not in skipped}

    rows = []
    for name, cfg in variants.items():
        lams = cfg.get("lambdas", lambdas)
        net = cfg.get("layers", layers)
        lr = cfg.get("lr", 1e-4)
        bm = cfg.get("batch_mult", 1)
        batch_v = {k: v * bm for k, v in batch.items()}

        def build():
            return PINN(net, problem, domain,
                        activation=cfg.get("act", "tanh"),
                        seed=1234, fourier_features=cfg.get("ff", 0),
                        fourier_scale=cfg.get("scale", 1.0),
                        hard_ic=cfg.get("hic", False))

        def run(model, epochs):
            return model.train(
                batch_v, epochs, lr, lams,
                adaptive_oversample=cfg.get("rad", 0.0),
                adaptive_weights_every=cfg.get("aw", 0),
                causal_eps=cfg.get("ce", 0.0),
                early_stopping_patience=cfg.get("patience", 0),
                early_stopping_min_delta=cfg.get("min_delta", 1e-6),
            )

        # Warm-up on a throwaway model: compiles the chunk-length trainer
        # (CLAUDE.md rule — timing must never include a fresh compile; the
        # chunked trainer means one scan-chunk program covers any total).
        from airpollution_tpu.models.pinn import _DEFAULT_SCAN_CHUNK
        run(build(), min(args.epochs, _DEFAULT_SCAN_CHUNK))

        model = build()
        t0 = time.time()
        h = run(model, cfg.get("epochs", args.epochs))
        if cfg.get("lbfgs"):
            h = model.finetune_lbfgs(batch_v, cfg["lbfgs"], lams)
        wall = time.time() - t0
        rel, l2, mx = model.compute_errors(md, problem.analytical_solution)
        row = {
            "variant": name, "mesh_size": args.mesh_size,
            "epochs": len(h["total_loss"]),
            "warm_train_time_s": round(wall, 2),
            "warm_epochs_per_sec": round(len(h["total_loss"]) / wall, 1),
            "final_loss": h["total_loss"][-1],
            "rel_l2": rel, "l2": l2, "max_error": mx,
        }
        rows.append(row)
        print(row, file=sys.stderr, flush=True)
        # Flush the merged table after EVERY variant: a tunnel drop
        # mid-sweep (observed: multi-hour axon outages) must not lose
        # the variants already measured.
        _write_merged(args.out, rows)

    print(f"saved {args.out}", file=sys.stderr, flush=True)
    return rows


def _write_merged(out_path, rows):
    """Merge ``rows`` into any existing table (key: variant + mesh size)
    so partial reruns never clobber rows they did not measure."""
    by_key = {}
    if os.path.exists(out_path):
        with open(out_path, newline="") as f:
            for old in csv.DictReader(f):
                # Pre-mesh_size-column rows were all measured at mesh 64.
                by_key[(old["variant"], old.get("mesh_size") or "64")] = old
    for row in rows:
        by_key[(row["variant"], str(row["mesh_size"]))] = row
    merged = list(by_key.values())
    fieldnames = list(dict.fromkeys(k for r in merged for k in r))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames, restval="")
        w.writeheader()
        w.writerows(merged)
    os.replace(tmp, out_path)


if __name__ == "__main__":
    main()
