"""Physics diagnostics for case studies (mass, COM, spreading, peaks)."""

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
    "center_of_mass_over_time",
    "concentration_profiles",
    "evaluate_pinn_on_grid",
    "mass_over_time",
    "peak_tracking",
    "quadrature_weights",
    "variance_over_time",
]
