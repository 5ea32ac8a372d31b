"""Physics diagnostics: mass, center of mass, spreading, peaks, profiles.

TPU-native counterpart of the reference's ``ComprehensiveAnalysis``
(scripts/problem3_comprehensive_analysis2.py:51-550 — the quadrature-correct
variant; the v1 script uses segment-length weights instead). The reference
loops Python-per-triangle-per-timestep, calling the PINN forward per
triangle — a pathological host loop (SURVEY.md section 3.5). Here every
quantity is one batched device computation:

- The per-triangle midpoint quadrature ``integral f ~ sum_tri area/3 *
  sum_{midpoints} f`` collapses to a dot product with per-DOF weights
  ``w_i = sum_{tri owning i} area/3`` (algebraically identical to the
  reference's loop; w equals the diagonal CR mass matrix).
- All timesteps are processed at once: masses/moments/variances are
  matmuls of the (nt, n_seg) solution array against weighted coordinate
  vectors.
- The PINN field is evaluated on the full (nt x n_seg) space-time grid in
  one forward pass.

Physics oracles (used as integration tests, SURVEY.md section 4):
theoretical center of mass ``(10, 10) + v t`` (:174-175), theoretical
spreading ``sigma0^2 + 2 D t`` with ``sigma0^2 = (12 - 8)^2 / 12`` (:289-291).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_MASS_EPS = 1e-10  # reference's guard (analysis2.py:156, :232)


def quadrature_weights(mesh_data) -> jnp.ndarray:
    """Per-DOF quadrature weights: w_i = sum over incident triangles of
    area/3 (equals the diagonal CR mass matrix)."""
    t2s = mesh_data.triangle_to_segments.reshape(-1)
    w = jax.ops.segment_sum(
        jnp.repeat(mesh_data.triangle_areas / 3.0, 3),
        t2s,
        num_segments=mesh_data.number_of_segments,
    )
    return w


def evaluate_pinn_on_grid(model, mesh_data, times=None) -> jnp.ndarray:
    """PINN field on the (nt, n_seg) space-time grid, one forward.

    ``times`` defaults to the full ``mesh_data.time_discr``; pass the
    snapshot times when comparing against a strided CRBE trajectory."""
    mid = mesh_data.midpoints
    times = mesh_data.time_discr if times is None else jnp.asarray(times)
    nt, n = times.shape[0], mid.shape[0]
    xyt = jnp.concatenate(
        [
            jnp.broadcast_to(mid[None, :, :], (nt, n, 2)).reshape(-1, 2),
            jnp.broadcast_to(times[:, None, None], (nt, n, 1)).reshape(-1, 1),
        ],
        axis=1,
    )
    return model.forward(xyt).reshape(nt, n)


def mass_over_time(U, weights) -> jnp.ndarray:
    """Total mass per timestep: (nt,) = U @ w (analysis2.py:60-103)."""
    return U @ weights


def center_of_mass_over_time(U, weights, midpoints):
    """(com_x, com_y, mass) per timestep (analysis2.py:105-187)."""
    mass = U @ weights
    mx = U @ (weights * midpoints[:, 0])
    my = U @ (weights * midpoints[:, 1])
    safe = mass > _MASS_EPS
    com_x = jnp.where(safe, mx / jnp.where(safe, mass, 1.0), 0.0)
    com_y = jnp.where(safe, my / jnp.where(safe, mass, 1.0), 0.0)
    return com_x, com_y, mass


def variance_over_time(U, weights, midpoints):
    """Plume variance per axis per timestep (analysis2.py:189-302).

    Uses the expansion sum w u (x - com)^2 = sum w u x^2 - 2 com sum w u x
    + com^2 sum w u — identical to the reference's two-pass loop."""
    com_x, com_y, mass = center_of_mass_over_time(U, weights, midpoints)
    safe = mass > _MASS_EPS
    denom = jnp.where(safe, mass, 1.0)

    def var_axis(coord, com):
        s2 = U @ (weights * coord**2)
        s1 = U @ (weights * coord)
        acc = s2 - 2 * com * s1 + com**2 * mass
        return jnp.where(safe, acc / denom, 0.0)

    var_x = var_axis(midpoints[:, 0], com_x)
    var_y = var_axis(midpoints[:, 1], com_y)
    return var_x, var_y


def peak_tracking(U, midpoints):
    """Peak value and location per timestep (analysis2.py:304-348)."""
    idx = jnp.argmax(U, axis=1)
    peaks = jnp.take_along_axis(U, idx[:, None], axis=1)[:, 0]
    locations = midpoints[idx]
    return peaks, locations


def concentration_profiles(U, mesh_data, y_slice=10.0, tol=0.5, times=None):
    """Transect profiles at y ~ y_slice for 4 time snapshots
    (analysis2.py:350-387). Host-side selection (static result shapes).

    ``times`` must match ``U.shape[0]`` (snapshot times for a strided
    trajectory); defaults to the full time discretization."""
    mid = np.asarray(mesh_data.midpoints)
    y_idx = np.where(np.abs(mid[:, 1] - y_slice) < tol)[0]
    order = np.argsort(mid[y_idx, 0])
    y_idx = y_idx[order]
    x_coords = mid[y_idx, 0]
    nt = U.shape[0]
    snapshots = [nt // 4, nt // 2, 3 * nt // 4, nt - 1]
    times = np.asarray(
        mesh_data.time_discr if times is None else times
    )
    U_np = np.asarray(U)
    return {
        f"t_{times[i]:.1f}": {
            "x_coords": x_coords,
            "profile": U_np[i, y_idx],
        }
        for i in snapshots
    }


class ComprehensiveAnalysis:
    """Batched CRBE-vs-PINN physics diagnostics (reference class API:
    analysis2.py:51-550, same result-dict keys and plot filenames)."""

    def __init__(self, problem, domain, mesh_data, solver_crbe, model_pinn,
                 quadrature="triangle"):
        """``quadrature``: "triangle" reproduces the v2 script's
        triangle-based integration (analysis2.py:73-90); "segment" the v1
        script's segment-length weights
        (problem3_comprehensive_analysis.py:73-109)."""
        self.problem = problem
        self.domain = domain
        self.mesh_data = mesh_data
        self.solver_crbe = solver_crbe
        self.model_pinn = model_pinn
        self.results = {}
        if quadrature == "triangle":
            self._w = quadrature_weights(mesh_data)
        elif quadrature == "segment":
            self._w = mesh_data.segment_lengths
        else:
            raise ValueError(f"unknown quadrature {quadrature}")
        self._U_crbe = jnp.asarray(solver_crbe.solutions)
        # Snapshot times must match the stored trajectory: a solver built
        # with snapshot_every=k stores a strided (nt-1)/k+1-row trajectory
        # (advisor finding, round 1 — times arrays were silently longer
        # than the masses/COM/variance arrays).
        times_full = np.asarray(mesh_data.time_discr)
        n_rows = int(self._U_crbe.shape[0])
        k_snap = getattr(solver_crbe, "snapshot_every", None)
        if n_rows == times_full.shape[0]:
            self._times = times_full
        elif k_snap and n_rows == (times_full.shape[0] - 1) // k_snap + 1:
            self._times = times_full[::k_snap]
        else:
            raise ValueError(
                f"stored trajectory has {n_rows} rows but the time "
                f"discretization has {times_full.shape[0]} points "
                f"(snapshot_every={k_snap}); cannot align diagnostics"
            )
        self._U_pinn = evaluate_pinn_on_grid(
            model_pinn, mesh_data, times=self._times
        )

    def compute_mass_conservation(self):
        crbe_masses = np.asarray(mass_over_time(self._U_crbe, self._w))
        pinn_masses = np.asarray(mass_over_time(self._U_pinn, self._w))
        self.results["mass_conservation"] = {
            "times": self._times,
            "crbe_masses": crbe_masses,
            "pinn_masses": pinn_masses,
            "initial_mass": crbe_masses[0],
        }
        return self.results["mass_conservation"]

    def compute_center_of_mass_tracking(self):
        times = self._times
        mid = self.mesh_data.midpoints
        cx, cy, _ = center_of_mass_over_time(self._U_crbe, self._w, mid)
        px, py, _ = center_of_mass_over_time(self._U_pinn, self._w, mid)
        v = np.asarray(self.problem.v)
        self.results["center_of_mass"] = {
            "times": times,
            "crbe_com_x": np.asarray(cx),
            "crbe_com_y": np.asarray(cy),
            "pinn_com_x": np.asarray(px),
            "pinn_com_y": np.asarray(py),
            # Initial center at (10, 10) (analysis2.py:174-175).
            "theoretical_com_x": 10.0 + v[0] * times,
            "theoretical_com_y": 10.0 + v[1] * times,
        }
        return self.results["center_of_mass"]

    def compute_spreading_rate_analysis(self):
        times = self._times
        mid = self.mesh_data.midpoints
        cvx, cvy = variance_over_time(self._U_crbe, self._w, mid)
        pvx, pvy = variance_over_time(self._U_pinn, self._w, mid)
        initial_variance = (12 - 8) ** 2 / 12  # uniform on [8,12]
        self.results["spreading_rate"] = {
            "times": times,
            "crbe_var_x": np.asarray(cvx),
            "crbe_var_y": np.asarray(cvy),
            "pinn_var_x": np.asarray(pvx),
            "pinn_var_y": np.asarray(pvy),
            "theoretical_var": initial_variance
            + 2 * float(self.problem.D) * times,
        }
        return self.results["spreading_rate"]

    def compute_peak_concentration_tracking(self):
        mid = self.mesh_data.midpoints
        cp, cl = peak_tracking(self._U_crbe, mid)
        pp, pl = peak_tracking(self._U_pinn, mid)
        self.results["peak_tracking"] = {
            "times": self._times,
            "crbe_peaks": np.asarray(cp),
            "pinn_peaks": np.asarray(pp),
            "crbe_peak_locations": np.asarray(cl),
            "pinn_peak_locations": np.asarray(pl),
        }
        return self.results["peak_tracking"]

    def compute_concentration_profiles(self, y_slice=10.0):
        crbe = concentration_profiles(
            self._U_crbe, self.mesh_data, y_slice, times=self._times
        )
        pinn = concentration_profiles(
            self._U_pinn, self.mesh_data, y_slice, times=self._times
        )
        profiles = {
            k: {
                "x_coords": crbe[k]["x_coords"],
                "crbe_profile": crbe[k]["profile"],
                "pinn_profile": pinn[k]["profile"],
            }
            for k in crbe
        }
        self.results["concentration_profiles"] = profiles
        return profiles

    def run_all_analyses(self):
        print("Starting comprehensive analysis...")
        self.compute_mass_conservation()
        self.compute_center_of_mass_tracking()
        self.compute_spreading_rate_analysis()
        self.compute_peak_concentration_tracking()
        self.compute_concentration_profiles()
        print("All analyses completed!")
        return self.results

    def summary_statistics(self):
        """Summary lines (analysis2.py:620-639): mass loss %, final COM
        error, peak decay %."""
        out = {}
        if "mass_conservation" in self.results:
            mc = self.results["mass_conservation"]
            out["mass_loss_crbe_pct"] = (
                (mc["crbe_masses"][-1] - mc["crbe_masses"][0])
                / mc["crbe_masses"][0] * 100
            )
            out["mass_loss_pinn_pct"] = (
                (mc["pinn_masses"][-1] - mc["pinn_masses"][0])
                / mc["pinn_masses"][0] * 100
            )
        if "center_of_mass" in self.results:
            com = self.results["center_of_mass"]
            out["com_error_x_crbe"] = abs(
                com["crbe_com_x"][-1] - com["theoretical_com_x"][-1]
            )
            out["com_error_x_pinn"] = abs(
                com["pinn_com_x"][-1] - com["theoretical_com_x"][-1]
            )
        if "peak_tracking" in self.results:
            pt = self.results["peak_tracking"]
            out["peak_decay_crbe_pct"] = (
                (pt["crbe_peaks"][0] - pt["crbe_peaks"][-1])
                / pt["crbe_peaks"][0] * 100
            )
            out["peak_decay_pinn_pct"] = (
                (pt["pinn_peaks"][0] - pt["pinn_peaks"][-1])
                / pt["pinn_peaks"][0] * 100
            )
        return out

    def plot_all_results(self, save_dir="analysis_plots"):
        """All five diagnostic figures (analysis2.py:402-550, same
        filenames)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(save_dir, exist_ok=True)
        colors = {"crbe": "#1f77b4", "pinn": "#ff7f0e",
                  "theoretical": "#2ca02c"}

        def save(fig, name):
            fig.tight_layout()
            fig.savefig(f"{save_dir}/{name}.png", dpi=300)
            fig.savefig(f"{save_dir}/{name}.pdf", dpi=600,
                        bbox_inches="tight")
            plt.close(fig)

        if "mass_conservation" in self.results:
            mc = self.results["mass_conservation"]
            fig, ax = plt.subplots(1, 1, figsize=(10, 6))
            ax.plot(mc["times"], mc["crbe_masses"], "o-",
                    color=colors["crbe"], label="CRBE", markersize=4)
            ax.plot(mc["times"], mc["pinn_masses"], "s-",
                    color=colors["pinn"], label="PINN", markersize=4)
            ax.axhline(y=mc["initial_mass"], color=colors["theoretical"],
                       linestyle="--", label="Initial Mass")
            ax.set_xlabel("Time (s)")
            ax.set_ylabel("Total Mass")
            ax.set_title("Mass Conservation Comparison")
            ax.legend(frameon=True, fancybox=True, shadow=True)
            ax.grid(True, alpha=0.3)
            save(fig, "mass_conservation")

        if "center_of_mass" in self.results:
            com = self.results["center_of_mass"]
            fig, axes = plt.subplots(1, 2, figsize=(15, 6))
            for ax, axis_name in zip(axes, ("x", "y")):
                ax.plot(com["times"], com[f"crbe_com_{axis_name}"], "o-",
                        color=colors["crbe"], label="CRBE", markersize=4)
                ax.plot(com["times"], com[f"pinn_com_{axis_name}"], "s-",
                        color=colors["pinn"], label="PINN", markersize=4)
                ax.plot(com["times"], com[f"theoretical_com_{axis_name}"],
                        "--", color=colors["theoretical"],
                        label="Theoretical")
                ax.set_xlabel("Time (s)")
                ax.set_ylabel(f"Center of Mass {axis_name.upper()} (m)")
                ax.set_title(
                    f"Center of Mass - {axis_name.upper()} Direction"
                )
                ax.legend(frameon=True, fancybox=True, shadow=True)
                ax.grid(True, alpha=0.3)
            save(fig, "center_of_mass")

        if "spreading_rate" in self.results:
            sr = self.results["spreading_rate"]
            fig, axes = plt.subplots(1, 2, figsize=(15, 6))
            for ax, axis_name in zip(axes, ("x", "y")):
                ax.plot(sr["times"], sr[f"crbe_var_{axis_name}"], "o-",
                        color=colors["crbe"], label="CRBE", markersize=4)
                ax.plot(sr["times"], sr[f"pinn_var_{axis_name}"], "s-",
                        color=colors["pinn"], label="PINN", markersize=4)
                ax.plot(sr["times"], sr["theoretical_var"], "--",
                        color=colors["theoretical"], label="Theoretical")
                ax.set_xlabel("Time (s)")
                ax.set_ylabel(f"Variance {axis_name.upper()} (m²)")
                ax.set_title(
                    f"Plume Spreading - {axis_name.upper()} Direction"
                )
                ax.legend(frameon=True, fancybox=True, shadow=True)
                ax.grid(True, alpha=0.3)
            save(fig, "spreading_rate")

        if "peak_tracking" in self.results:
            pt = self.results["peak_tracking"]
            fig, ax = plt.subplots(1, 1, figsize=(10, 6))
            ax.plot(pt["times"], pt["crbe_peaks"], "o-",
                    color=colors["crbe"], label="CRBE", markersize=4)
            ax.plot(pt["times"], pt["pinn_peaks"], "s-",
                    color=colors["pinn"], label="PINN", markersize=4)
            ax.set_xlabel("Time (s)")
            ax.set_ylabel("Peak Concentration")
            ax.set_title("Peak Concentration Evolution")
            ax.legend(frameon=True, fancybox=True, shadow=True)
            ax.grid(True, alpha=0.3)
            save(fig, "peak_concentration")

        if "concentration_profiles" in self.results:
            profiles = self.results["concentration_profiles"]
            fig, axes = plt.subplots(2, 2, figsize=(15, 12))
            for i, (time_key, pdata) in enumerate(profiles.items()):
                if i >= 4:
                    break
                ax = axes.flatten()[i]
                ax.plot(pdata["x_coords"], pdata["crbe_profile"], "o-",
                        color=colors["crbe"], label="CRBE", markersize=4)
                ax.plot(pdata["x_coords"], pdata["pinn_profile"], "s-",
                        color=colors["pinn"], label="PINN", markersize=4)
                ax.set_xlabel("X coordinate (m)")
                ax.set_ylabel("Concentration")
                ax.set_title(f"Concentration Profile at {time_key}")
                ax.legend(frameon=True, fancybox=True, shadow=True)
                ax.grid(True, alpha=0.3)
            save(fig, "concentration_profiles")

        print(f"All plots saved to {save_dir}/")
