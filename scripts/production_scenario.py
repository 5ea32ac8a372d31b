"""Production air-quality scenario on the fused HBM canvas kernel.

The combination a real dispersion run needs, in one solve — newly
unlocked by Robin support on the canvas stripe kernel:

- **sheared boundary-layer wind** (variable coefficients): a
  log-profile u(z) with z = height above the bottom wall, the standard
  neutral surface-layer wind (u = (u*/kappa) ln(1 + z/z0)), crosswind
  component zero;
- **steady stack emission**: a Gaussian source of total rate q near the
  ground, evaluated in-kernel (zero extra HBM traffic);
- **ground surface exchange**: Robin wall on the bottom side — pure
  dry deposition ``-D dc/dn = v_d c`` by default, or the standard
  bidirectional compensation-point model ``-D dc/dn = v_d (c -
  c_comp)`` (NH3-style re-emission; alpha = v_d, g = v_d c_comp via
  the elementwise ``robin_g_xy`` hook, evaluated in-kernel on the wall
  line) — plus a no-flux lid (alpha = 0) on top and clean-air
  Dirichlet inflow/outflow left/right;
- **Crank-Nicolson** time stepping + strided snapshots, all inside the
  HBM-tiled canvas stripe kernel (ops/pallas_hbm.fused_solve_canvas_hbm).

Physics oracle: the lumped-mass budget. d(mass)/dt = q - net surface
exchange - outflow; the script integrates the net flux
sum(alpha |e| c) - sum(g |e|) over the bottom-wall DOFs from the
snapshots and reports the budget closure. The reference
(crbe.py:406-433, all-Dirichlet, constant wind, scipy spsolve) can
express none of these terms.

Writes results_snapshot/production_scenario.json (when --write).
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
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.mesh.data import boundary_side_masks
from airpollution_tpu.models.crbe import CRBESolver, robin_terms
from airpollution_tpu.problems import AdDifProblem


def log(*a):
    print(*a, flush=True)


class BoundaryLayerEmitter(AdDifProblem):
    """Neutral surface-layer wind + steady stack emission + ground
    deposition. y is height above the bottom wall (the "ground")."""

    zero_source = False
    steady_source = True
    variable_coefficients = True

    def __init__(self, ustar=0.2, kappa=0.4, z0=1.0, q=1.0,
                 xs=-10.0, ys=-16.0, sigma_s=1.2, D=0.2, v_d=0.05,
                 c_comp=0.0, ground=-20.0):
        super().__init__(None, D, 0.0)
        self.ustar = ustar
        self.kappa = kappa
        self.z0 = z0
        self.q = q
        self.xs = xs
        self.ys = ys
        self.sigma_s = sigma_s
        self.ground = ground
        self.v_d = v_d
        self.c_comp = c_comp
        self.robin_sides = {"bottom": v_d, "top": 0.0}
        if c_comp:
            # Compensation-point exchange: -D dc/dn = v_d (c - c_comp)
            # on the ground, i.e. g = v_d * c_comp (re-emission where
            # the air is cleaner than the surface). Instance-assigned
            # only when active, so pure-deposition runs keep the
            # zero-g-load kernel program (the default robin_g delegates
            # to this hook, so the scan paths see the same law).
            def _g(x, y, t, side, _g0=v_d * c_comp):
                x = jnp.asarray(x)
                y = jnp.asarray(y)
                if side == "bottom":
                    return jnp.full_like(x + y, _g0)
                return jnp.zeros_like(x + y)

            self.robin_g_xy = _g

    def _u(self, y):
        z = jnp.maximum(y - self.ground, 0.0)
        return (self.ustar / self.kappa) * jnp.log1p(z / self.z0)

    def velocity_at(self, xy):
        xy = jnp.asarray(xy)
        u = self._u(xy[..., 1])
        return jnp.stack([u, jnp.zeros_like(u)], axis=-1)

    def initial_condition_fn(self, xy):
        xy = jnp.asarray(xy)
        return jnp.zeros(xy.shape[:-1], dtype=xy.dtype)

    def boundary_fn(self, xyt):
        xyt = jnp.asarray(xyt)
        return jnp.zeros_like(xyt[..., 0])

    def source_xy(self, x, y, t):
        r2 = (x - self.xs) ** 2 + (y - self.ys) ** 2
        s2 = self.sigma_s**2
        return self.q * jnp.exp(-r2 / (2.0 * s2)) / (2.0 * jnp.pi * s2)

    def source_term(self, xyt):
        xyt = jnp.asarray(xyt)
        return self.source_xy(xyt[..., 0], xyt[..., 1], xyt[..., 2])


def run(ms, nt, every, iters, q=1.0, v_d=0.05, c_comp=0.0, warm=True):
    mesh = apt.create_mesh(ms, domain_size=20.0)
    domain = apt.Domain()
    problem = BoundaryLayerEmitter(q=q, v_d=v_d, c_comp=c_comp)
    md = apt.MeshData(mesh, domain, nt=nt)
    solver = CRBESolver(domain, problem, md, matvec_impl="fused_hbm",
                        solver_method="chebyshev", chebyshev_iters=iters,
                        time_scheme_order=2, extrapolate_warm_start=True,
                        snapshot_every=every)
    t0 = time.time()
    U = solver.solve(store_solutions=True)
    U.block_until_ready()
    log(f"[{ms}^2] first solve (compile+run) {time.time() - t0:.1f}s; "
        f"snapshots {U.shape}")
    dt_solve = None
    if warm:
        t0 = time.time()
        U = solver.solve(store_solutions=True)
        U.block_until_ready()
        dt_solve = time.time() - t0
        log(f"[{ms}^2] warm solve {dt_solve:.3f}s -> "
            f"{(nt - 1) / dt_solve:.0f} steps/s")

    # --- lumped-mass budget from the strided snapshots ---
    m = np.asarray(solver.global_mass_diag)
    Un = np.asarray(U)
    mass = Un @ m
    dmask, rmask, alpha = robin_terms(md, problem)
    alpha = np.asarray(alpha)  # alpha * |e| per DOF (bottom wall only)
    dep_rate = Un @ alpha  # instantaneous deposition flux per snapshot
    t_snap = np.arange(U.shape[0]) * every * solver.dt
    emitted = q * t_snap[-1]
    # Re-emission (compensation point): steady g = v_d * c_comp over
    # the bottom-wall edges, so the rate is v_d * c_comp * wall length.
    side = boundary_side_masks(md)
    bot = np.asarray(side["bottom"])
    wall_len = float(np.asarray(md.segment_lengths)[bot].sum())
    reemit_rate = v_d * c_comp * wall_len
    deposited = float(np.trapezoid(dep_rate, t_snap))
    reemitted = reemit_rate * float(t_snap[-1])
    accumulated = float(mass[-1] - mass[0])
    # Residual = advective/diffusive loss through the Dirichlet
    # inflow/outflow walls + time-integration error of the trapezoid
    # over strided snapshots.
    outflow = emitted + reemitted - deposited - accumulated
    log(f"[{ms}^2] budget: emitted {emitted:.4f} + re-emitted "
        f"{reemitted:.4f}, accumulated {accumulated:.4f}, deposited "
        f"{deposited:.4f}, outflow+residual {outflow:.4f}")

    return {
        "mesh_size": ms, "n_dofs": int(md.number_of_segments),
        "nt": nt, "snapshot_every": every, "chebyshev_iters": iters,
        "scheme": "crank-nicolson", "q": q, "v_d": v_d,
        "c_comp": c_comp,
        "warm_solve_s": dt_solve,
        "steps_per_sec": (None if dt_solve is None
                          else (nt - 1) / dt_solve),
        "mass_final": float(mass[-1]),
        "emitted": float(emitted),
        "reemitted": reemitted,
        "accumulated": accumulated,
        "deposited": deposited,
        "outflow_plus_residual": float(outflow),
        "deposited_frac_of_emitted": deposited / emitted,
        "net_surface_uptake": deposited - reemitted,
        "peak_final": float(Un[-1].max()),
        "ground_mean_final": float(Un[-1][bot].mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_sizes", type=int, nargs="+",
                    default=[513, 1025, 513])
    ap.add_argument("--nt", type=int, nargs="+",
                    default=[1001, 2001, 1001])
    ap.add_argument("--snapshot_every", type=int, nargs="+",
                    default=[100, 200, 100])
    ap.add_argument("--iters", type=int, nargs="+", default=[8, 8, 8])
    # Surface compensation point per run: 0 = pure deposition; the
    # third default run re-emits where ground air is cleaner than the
    # surface (ground-level c ~0.008 in the default plume).
    ap.add_argument("--c_comp", type=float, nargs="+",
                    default=[0.0, 0.0, 0.005])
    ap.add_argument("--no_warm", action="store_true")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")

    rows = []
    for ms, nt, every, iters, cc in zip(args.mesh_sizes, args.nt,
                                        args.snapshot_every, args.iters,
                                        args.c_comp, strict=True):
        rows.append(run(ms, nt, every, iters, c_comp=cc,
                        warm=not args.no_warm))
    if args.write:
        out = os.path.join(os.path.dirname(__file__), "..",
                           "results_snapshot", "production_scenario.json")
        with open(os.path.abspath(out), "w") as f:
            json.dump(rows, f, indent=2)
        log(f"wrote {os.path.abspath(out)}")
    for r in rows:
        log(json.dumps(r))


if __name__ == "__main__":
    main()
