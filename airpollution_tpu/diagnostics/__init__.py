"""Physics diagnostics for case studies (mass, COM, spreading, peaks)
plus differentiable-solve inverse problems (parameter estimation)."""

from airpollution_tpu.diagnostics.inverse import (
    fit_chemistry,
    fit_deposition,
    fit_surface_exchange,
    fit_diffusion,
    fit_initial_condition,
    fit_parameters,
    fit_source,
    posterior_covariance,
    receptor_footprint,
    solve_final_state,
    solve_multispecies_snapshots,
    solve_snapshots,
)
from airpollution_tpu.diagnostics.ensemble import (
    enkf_update,
    ensemble_forecast,
    place_sensors,
    stack_problems,
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
    "enkf_update",
    "ensemble_forecast",
    "place_sensors",
    "stack_problems",
    "fit_chemistry",
    "fit_deposition",
    "fit_surface_exchange",
    "fit_diffusion",
    "fit_initial_condition",
    "fit_parameters",
    "fit_source",
    "posterior_covariance",
    "receptor_footprint",
    "solve_final_state",
    "solve_multispecies_snapshots",
    "solve_snapshots",
    "center_of_mass_over_time",
    "concentration_profiles",
    "evaluate_pinn_on_grid",
    "mass_over_time",
    "peak_tracking",
    "quadrature_weights",
    "variance_over_time",
]
