"""Physics diagnostics for case studies (mass, COM, spreading, peaks)
plus differentiable-solve inverse problems (parameter estimation)."""

from airpollution_tpu.diagnostics.inverse import (
    fit_diffusion,
    fit_parameters,
    solve_final_state,
)
from airpollution_tpu.diagnostics.analysis import (
    ComprehensiveAnalysis,
    center_of_mass_over_time,
    concentration_profiles,
    evaluate_pinn_on_grid,
    mass_over_time,
    peak_tracking,
    quadrature_weights,
    variance_over_time,
)

__all__ = [
    "ComprehensiveAnalysis",
    "fit_diffusion",
    "fit_parameters",
    "solve_final_state",
    "center_of_mass_over_time",
    "concentration_profiles",
    "evaluate_pinn_on_grid",
    "mass_over_time",
    "peak_tracking",
    "quadrature_weights",
    "variance_over_time",
]
