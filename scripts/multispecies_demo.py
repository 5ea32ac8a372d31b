"""Multi-species coupled-chemistry demo: decay-chain convergence table +
chemistry-rate identification from noisy observations.

The capability the reference cannot express at all (crbe.py:225-482
evolves one scalar field): a 3-species chain A -> B -> C with
independent removal, solved by the Strang-split MultiSpeciesSolver
(models/multispecies) and validated against the expm-mixture closed
form (problems.MultiSpeciesProblem.analytical_solution). Then the
inverse direction: recover the chain's three rate constants from 1%%-
noisy trajectory observations via the coupled discrete adjoint
(diagnostics/inverse.fit_chemistry).

Writes results_snapshot/multispecies.csv (convergence rows per species
+ one inversion row).

    APT_PLATFORM=cpu python scripts/multispecies_demo.py
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
from airpollution_tpu.diagnostics import inverse
from airpollution_tpu.models import MultiSpeciesSolver
from airpollution_tpu.problems import MultiSpeciesProblem, Problem


def chain_R(r1, r2, r3, module=np):
    """A -> B -> C chain with removal r3 on C (rows: species equations)."""
    z = 0.0 * r1
    return module.stack([
        module.stack([r1, z, z]),
        module.stack([-r1, r2, z]),
        module.stack([z, -r2, r3]),
    ])


RATES_TRUE = (0.25, 0.10, 0.05)


def make_problem():
    # Three plumes with distinct widths: A the fresh emission, B/C the
    # (initially present) products. Shared (v, D) -> exact oracle.
    species = (Problem(sigma=1.0), Problem(sigma=2.0), Problem(sigma=3.0))
    return MultiSpeciesProblem(species, chain_R(*RATES_TRUE))


def convergence_rows(mesh_sizes, nt):
    rows = []
    domain = apt.Domain()
    msp = make_problem()
    for ms in mesh_sizes:
        md = apt.MeshData(apt.create_mesh(ms, domain.Lx), domain, nt=nt,
                          dtype=jnp.float64)
        solver = MultiSpeciesSolver(domain, msp, md, time_scheme_order=2)
        t0 = time.time()
        solver.solve(store_solutions=False)
        wall = time.time() - t0
        err = solver.compute_errors()
        h = float(md.diameter)
        print(f"ms={ms:4d} dofs={md.number_of_segments:7d} "
              f"rel_l2={err['rel_l2_error']:.4f} "
              f"per-species={[round(e['rel_l2_error'], 4) for e in err['per_species']]} "
              f"({wall:.1f}s)", flush=True)
        rows.append({
            "kind": "convergence", "mesh_size": ms,
            "n_dofs": md.number_of_segments, "h": h, "nt": nt,
            "rel_l2_total": err["rel_l2_error"],
            "rel_l2_A": err["per_species"][0]["rel_l2_error"],
            "rel_l2_B": err["per_species"][1]["rel_l2_error"],
            "rel_l2_C": err["per_species"][2]["rel_l2_error"],
            "max_error_total": err["max_error"],
            "solve_time_s": wall,
        })
    # log-log L2 rate over the swept sizes
    hs = np.array([r["h"] for r in rows])
    es = np.array([r["rel_l2_total"] for r in rows])
    rate = np.polyfit(np.log(hs), np.log(es), 1)[0]
    print(f"measured L2 rate: O(h^{rate:.2f})", flush=True)
    for r in rows:
        r["l2_rate"] = rate
    return rows


def inversion_row(ms, nt, noise, steps, lr):
    domain = apt.Domain(T=4.0)
    msp = make_problem()
    md = apt.MeshData(apt.create_mesh(ms, domain.Lx), domain, nt=nt,
                      dtype=jnp.float64)
    idx = list(range(nt // 4, nt, nt // 4))
    obs = inverse.solve_multispecies_snapshots(msp, md, indices=idx)
    rng = np.random.default_rng(0)
    obs = np.asarray(obs) * (1 + noise * rng.standard_normal(
        np.asarray(obs).shape))

    def make_R(p):
        return chain_R(jnp.exp(p["log_r1"]), jnp.exp(p["log_r2"]),
                       jnp.exp(p["log_r3"]), module=jnp)

    init = {"log_r1": jnp.log(jnp.asarray(0.05)),
            "log_r2": jnp.log(jnp.asarray(0.5)),
            "log_r3": jnp.log(jnp.asarray(0.02))}
    t0 = time.time()
    _, params, losses = inverse.fit_chemistry(
        obs, md, msp.species, make_R=make_R, init_params=init,
        snapshot_indices=idx, steps=steps, lr=lr,
    )
    wall = time.time() - t0
    fit = [float(jnp.exp(params[k])) for k in ("log_r1", "log_r2",
                                               "log_r3")]
    errs = [abs(f - t) / t for f, t in zip(fit, RATES_TRUE)]
    print(f"inversion: truth {RATES_TRUE} -> fit "
          f"{[round(f, 4) for f in fit]} "
          f"(rel errs {[f'{e:.2%}' for e in errs]}, {wall:.0f}s, "
          f"loss {losses[0]:.2e}->{losses[-1]:.2e})", flush=True)
    return {
        "kind": "inversion", "mesh_size": ms, "nt": nt,
        "noise": noise, "adam_steps": steps,
        "r1_true": RATES_TRUE[0], "r2_true": RATES_TRUE[1],
        "r3_true": RATES_TRUE[2],
        "r1_fit": fit[0], "r2_fit": fit[1], "r3_fit": fit[2],
        "r1_rel_err": errs[0], "r2_rel_err": errs[1],
        "r3_rel_err": errs[2],
        "fit_time_s": wall,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_sizes", type=int, nargs="*",
                    default=[8, 16, 32, 64])
    ap.add_argument("--nt", type=int, default=129)
    ap.add_argument("--inv_mesh_size", type=int, default=16)
    ap.add_argument("--inv_nt", type=int, default=33)
    ap.add_argument("--noise", type=float, default=0.01)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--out", default="results_snapshot/multispecies.csv")
    args = ap.parse_args()

    rows = convergence_rows(args.mesh_sizes, args.nt)
    rows.append(inversion_row(args.inv_mesh_size, args.inv_nt, args.noise,
                              args.steps, args.lr))

    fields = sorted({k for r in rows for k in r})
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
