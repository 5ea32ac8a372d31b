"""Solution/error plotting (host-side matplotlib, parity with crbe.py/pinn.py).

Counterparts of the reference plot methods: tricontourf over the midpoint
triangulation (crbe.py:485-552), vertex-averaged "interpolated" plots
(crbe.py:572-660, pinn.py:368-437) and error-evolution curves
(crbe.py:554-570). The segment->vertex averaging loop of the reference
(crbe.py:602-609) is vectorized with ``np.add.at``.
"""

from __future__ import annotations

import os

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.tri as mtri

    return plt, mtri


def vertex_average(points, segments, midpoint_values):
    """Average segment-midpoint DOF values onto mesh vertices
    (vectorized crbe.py:598-609)."""
    vertex_values = np.zeros(len(points))
    count = np.zeros(len(points))
    vals = np.asarray(midpoint_values)
    segs = np.asarray(segments)
    np.add.at(vertex_values, segs[:, 0], vals)
    np.add.at(vertex_values, segs[:, 1], vals)
    np.add.at(count, segs[:, 0], 1)
    np.add.at(count, segs[:, 1], 1)
    return vertex_values / np.maximum(count, 1)


def _solution_row(solver, time_index):
    """Map a FULL-resolution step index onto the stored trajectory row.

    Solvers built with ``snapshot_every=k`` store ``(nt-1)/k + 1`` rows;
    indexing them with the raw step index would silently plot the wrong
    state (JAX clamps out-of-bounds indices instead of raising) — the
    same strided-trajectory pitfall fixed in diagnostics/analysis.py.
    """
    md = solver.mesh_data
    if time_index is None:
        time_index = md.nt - 1
    n_rows = len(solver.solutions)
    if n_rows == 1:
        # store_solutions=False: the single stored row IS the final
        # state — plottable at (and only at) the final step index.
        if time_index != md.nt - 1:
            raise ValueError(
                f"time_index {time_index} requested but this solver "
                f"stored only the final state (store_solutions=False); "
                f"re-solve with store_solutions=True for intermediate "
                f"steps"
            )
        return 0, time_index, time_index * solver.dt
    stride = getattr(solver, "snapshot_every", None) or 1
    if time_index % stride:
        raise ValueError(
            f"time_index {time_index} is not a stored snapshot: this "
            f"solver stores every {stride}-th step (snapshot_every)"
        )
    row = time_index // stride
    if not 0 <= row < n_rows:
        raise ValueError(
            f"time_index {time_index} (row {row}) is outside the stored "
            f"trajectory of {n_rows} rows"
        )
    return row, time_index, time_index * solver.dt


def plot_solution_on_midpoints(solver, analytical_sol_fn=None,
                               time_index=None, save_dir="results"):
    """Numerical / analytical / error panels on the midpoint triangulation
    (crbe.py:485-552)."""
    plt, mtri = _mpl()
    md = solver.mesh_data
    row, time_index, t = _solution_row(solver, time_index)
    os.makedirs(save_dir, exist_ok=True)

    midpoints = np.asarray(md.midpoints)
    t2s = np.asarray(md.triangle_to_segments)
    u_num = np.asarray(solver.solutions[row])
    triang = mtri.Triangulation(midpoints[:, 0], midpoints[:, 1], t2s)

    if analytical_sol_fn is not None:
        xyt = np.hstack([midpoints, np.full((len(midpoints), 1), t)])
        u_ex = np.asarray(analytical_sol_fn(xyt))
        err = u_num - u_ex
        fig, axs = plt.subplots(1, 3, figsize=(18, 6))
        for ax, vals, title, cmap in (
            (axs[0], u_num, f"Numerical Solution at t = {t:.3f}", "viridis"),
            (axs[1], u_ex, f"Analytical Solution at t = {t:.3f}", "viridis"),
            (axs[2], err, f"Error at t = {t:.3f}", "coolwarm"),
        ):
            c = ax.tricontourf(triang, vals, 20, cmap=cmap)
            ax.set_title(title)
            ax.set_xlabel("x")
            ax.set_ylabel("y")
            fig.colorbar(c, ax=ax)
    else:
        fig, ax = plt.subplots(figsize=(10, 8))
        c = ax.tricontourf(triang, u_num, 20, cmap="viridis")
        ax.set_title(f"Numerical Solution at t = {t:.3f}")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        fig.colorbar(c, ax=ax)

    plt.tight_layout()
    plt.savefig(f"{save_dir}/solution_t{time_index}.png", dpi=300)
    plt.close(fig)


def plot_interpolated_solution(solver, analytical_sol_fn=None,
                               time_index=None, save_dir="results", name=""):
    """Vertex-averaged solution plot, PNG + PDF (crbe.py:572-660)."""
    plt, mtri = _mpl()
    md = solver.mesh_data
    row, time_index, t = _solution_row(solver, time_index)
    os.makedirs(save_dir, exist_ok=True)

    points = np.asarray(md.points)
    triangles = np.asarray(md.triangles)
    vertex_values = vertex_average(
        points, md.segments, solver.solutions[row]
    )
    triang = mtri.Triangulation(points[:, 0], points[:, 1], triangles)

    if analytical_sol_fn is not None:
        xyt = np.hstack([points, np.full((len(points), 1), t)])
        u_ex = np.asarray(analytical_sol_fn(xyt))
        fig, axs = plt.subplots(1, 2, figsize=(15, 5))
        for ax, vals, title in (
            (axs[0], vertex_values, f"Numerical Solution at t = {t:.3f}"),
            (axs[1], u_ex, f"Analytical Solution at t = {t:.3f}"),
        ):
            c = ax.tricontourf(triang, vals, 20, cmap="viridis")
            ax.set_title(title)
            ax.set_xlabel("x")
            ax.set_ylabel("y")
            fig.colorbar(c, ax=ax)
    else:
        fig, ax = plt.subplots(figsize=(10, 8))
        c = ax.tricontourf(triang, vertex_values, 20, cmap="viridis")
        ax.set_title(f"Numerical Solution at t = {t:.3f}")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        fig.colorbar(c, ax=ax)

    plt.tight_layout()
    base = f"{save_dir}/solution_t{time_index}_interpolated_{name}"
    plt.savefig(base + ".png", dpi=300)
    plt.savefig(base + ".pdf", dpi=300)
    plt.close(fig)
    print(f"Saved at {base}.png/pdf")


def plot_error_evolution(solver, errors, save_dir="results"):
    """Semilogy L2/Linf error curves over time (crbe.py:554-570)."""
    plt, _ = _mpl()
    os.makedirs(save_dir, exist_ok=True)
    # Size the time axis to the error curves themselves: strided
    # (snapshot_every>1) trajectories yield fewer rows than nt.
    n_rows = len(errors["l2_errors"])
    time_values = np.linspace(0, solver.domain.T, n_rows)
    fig = plt.figure(figsize=(10, 6))
    plt.semilogy(time_values, errors["l2_errors"], "b-", label="L2 Error")
    plt.semilogy(time_values, errors["linf_errors"], "r-", label="L∞ Error")
    plt.grid(True)
    plt.xlabel("Time")
    plt.ylabel("Error (log scale)")
    plt.title("Error Evolution")
    plt.legend()
    plt.tight_layout()
    plt.savefig(f"{save_dir}/error_evolution.png", dpi=300)
    plt.close(fig)


def plot_loss_history(history, save_dir="results", name=""):
    """Semilogy loss curves (pinn.py:302-317)."""
    plt, _ = _mpl()
    os.makedirs(save_dir, exist_ok=True)
    fig = plt.figure(figsize=(10, 6))
    plt.semilogy(history["total_loss"], label="Total Loss", ls="-.")
    plt.semilogy(history["pde_loss"], label="PDE Loss")
    plt.semilogy(history["ic_loss"], label="IC Loss")
    plt.semilogy(history["bc_loss"], label="BC Loss")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.title("Training Loss History")
    plt.legend()
    plt.grid(True, which="both", ls="--")
    plt.savefig(f"{save_dir}/loss_history_{name}.pdf", dpi=500)
    plt.savefig(f"{save_dir}/loss_history_{name}.png", dpi=500)
    plt.tight_layout()
    plt.close(fig)


def plot_pinn_solution(model, t, mesh_data, analytical_sol_fn=None,
                       save_dir="results"):
    """PINN solution evaluated at mesh vertices (pinn.py:319-366)."""
    plt, mtri = _mpl()
    os.makedirs(save_dir, exist_ok=True)
    points = np.asarray(mesh_data.points)
    triangles = np.asarray(mesh_data.triangles)
    xyt = np.hstack([points, np.full((len(points), 1), t)])
    u_num = np.asarray(model.forward(xyt)).ravel()
    triang = mtri.Triangulation(points[:, 0], points[:, 1], triangles)

    if analytical_sol_fn is not None:
        u_ex = np.asarray(analytical_sol_fn(xyt)).ravel()
        fig, axs = plt.subplots(1, 2, figsize=(15, 5))
        panels = ((axs[0], u_num, "Numerical"), (axs[1], u_ex, "Analytical"))
    else:
        fig, ax = plt.subplots(figsize=(10, 8))
        panels = ((ax, u_num, "Numerical"),)
    for ax, vals, label in panels:
        c = ax.tricontourf(triang, vals, 20, cmap="viridis")
        ax.set_title(f"{label} Solution at t = {t:.3f}")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        fig.colorbar(c, ax=ax)
    plt.tight_layout()
    plt.savefig(f"{save_dir}/solution_{t}.pdf", dpi=500)
    plt.savefig(f"{save_dir}/solution_{t}.png", dpi=500)
    plt.close(fig)


def plot_pinn_interpolated_solution(model, t, mesh_data,
                                    analytical_sol_fn=None,
                                    save_dir="results", name=""):
    """PINN evaluated at CR midpoints then vertex-averaged like the FEM
    plots, for like-for-like comparison (pinn.py:368-437)."""
    plt, mtri = _mpl()
    os.makedirs(save_dir, exist_ok=True)
    midpoints = np.asarray(mesh_data.midpoints)
    xyt_mid = np.hstack([midpoints, np.full((len(midpoints), 1), t)])
    u_mid = np.asarray(model.forward(xyt_mid)).ravel()

    points = np.asarray(mesh_data.points)
    triangles = np.asarray(mesh_data.triangles)
    vertex_values = vertex_average(points, mesh_data.segments, u_mid)
    triang = mtri.Triangulation(points[:, 0], points[:, 1], triangles)

    if analytical_sol_fn is not None:
        xyt_v = np.hstack([points, np.full((len(points), 1), t)])
        u_ex = np.asarray(analytical_sol_fn(xyt_v)).ravel()
        fig, axs = plt.subplots(1, 2, figsize=(15, 5))
        panels = ((axs[0], vertex_values, "Numerical"),
                  (axs[1], u_ex, "Analytical"))
    else:
        fig, ax = plt.subplots(figsize=(10, 8))
        panels = ((ax, vertex_values, "Numerical"),)
    for ax, vals, label in panels:
        c = ax.tricontourf(triang, vals, 20, cmap="viridis")
        ax.set_title(f"{label} Solution at t = {t:.3f}")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        fig.colorbar(c, ax=ax)
    plt.tight_layout()
    base = f"{save_dir}/solution_{t}_interpolated_solution_{name}"
    plt.savefig(base + ".pdf", dpi=500)
    plt.savefig(base + ".png", dpi=500)
    plt.close(fig)
    print(f"Saved at {base}.pdf/png")


def plot_exceedance_maps(mesh_data, exceedance, thresholds,
                         save_dir="results", name="exceedance"):
    """Alert-probability panels P(c(x, T) > tau) from an ensemble
    forecast (diagnostics/ensemble.ensemble_forecast 'exceedance'
    product): one tricontourf per threshold on the midpoint
    triangulation, probability colormap fixed to [0, 1]."""
    plt, mtri = _mpl()
    md = mesh_data
    os.makedirs(save_dir, exist_ok=True)
    midpoints = np.asarray(md.midpoints)
    t2s = np.asarray(md.triangle_to_segments)
    triang = mtri.Triangulation(midpoints[:, 0], midpoints[:, 1], t2s)
    exc = np.asarray(exceedance)
    n = exc.shape[0]
    fig, axs = plt.subplots(1, n, figsize=(6 * n, 5.5), squeeze=False)
    levels = np.linspace(0.0, 1.0, 21)
    for ax, probs, tau in zip(axs[0], exc, thresholds):
        c = ax.tricontourf(triang, probs, levels=levels, cmap="magma",
                           vmin=0.0, vmax=1.0)
        ax.set_title(f"P(c > {tau:g}) at t = T")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        fig.colorbar(c, ax=ax)
    plt.tight_layout()
    path = f"{save_dir}/{name}.png"
    plt.savefig(path, dpi=300)
    plt.close(fig)
    return path


def plot_footprint(mesh_data, footprint, receptor_index,
                   save_dir="results", name="footprint"):
    """Receptor source-attribution map (diagnostics.receptor_footprint
    row): the adjoint sensitivity of one station's final-time reading to
    a steady per-DOF emission field, with the receptor marked."""
    plt, mtri = _mpl()
    md = mesh_data
    os.makedirs(save_dir, exist_ok=True)
    midpoints = np.asarray(md.midpoints)
    t2s = np.asarray(md.triangle_to_segments)
    triang = mtri.Triangulation(midpoints[:, 0], midpoints[:, 1], t2s)
    F = np.asarray(footprint)
    fig, ax = plt.subplots(figsize=(8, 6.5))
    c = ax.tricontourf(triang, F, 30, cmap="viridis")
    rx, ry = midpoints[int(receptor_index)]
    ax.plot([rx], [ry], marker="*", markersize=16, color="red",
            markeredgecolor="white", linestyle="none", label="receptor")
    ax.legend(loc="upper right")
    ax.set_title("Receptor footprint  dc(x_r, T) / ds_j")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    fig.colorbar(c, ax=ax)
    plt.tight_layout()
    path = f"{save_dir}/{name}.png"
    plt.savefig(path, dpi=300)
    plt.close(fig)
    return path
