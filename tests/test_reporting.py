"""Tests for the reporting layer: LaTeX formatting, rates, table assembly."""

import numpy as np
import pandas as pd

from airpollution_tpu.reporting.table_generator import (
    convergence_rates,
    format_sci,
    generate_latex_tables,
)


def test_format_sci_reference_cases():
    """Formatting contract of table_generator.py:18-44."""
    assert format_sci(0) == "$0$"
    assert format_sci(5e-5) == "$5\\cdot 10^{-5}$"
    assert format_sci(0.496) == "$0.4960$"
    assert format_sci(57.1) == "$57.100$"
    assert format_sci(123.4) == "$123.40$"
    assert format_sci(1234.5) == "$1234.5$"
    assert format_sci(12345.0) == "$1.23\\cdot 10^{4}$"


def test_convergence_rates_recover_known_slope():
    """Errors decaying exactly as h^2 regress to rate 2.0 with R^2 = 1."""
    mesh = np.array([4, 8, 16, 32, 64, 128])
    h = 1 / mesh
    df = pd.DataFrame({
        "mesh_size": mesh,
        "rel_l2_error": 3.0 * h**2,
        "max_error": 0.5 * h**1.0,
    })
    l2_rate, l2_r, linf_rate, linf_r = convergence_rates(df)
    assert abs(l2_rate - 2.0) < 1e-10
    assert abs(linf_rate - 1.0) < 1e-10
    assert abs(abs(l2_r) - 1.0) < 1e-12


def _fake_results():
    mesh = [4, 8, 16, 32, 64, 128]
    n = len(mesh)
    base = {
        "mesh_size": mesh,
        "rel_l2_error": np.geomspace(10, 0.1, n),
        "max_error": np.geomspace(0.5, 0.01, n),
        "train_time": np.linspace(1, 60, n),
        "number_of_collocation_points": [33, 161, 705, 2945, 12033, 48641],
        "cpu_memory_usage_MB": np.linspace(1, 100, n),
        "gpu_memory_usage_MB": np.linspace(1, 50, n),
    }
    df_crbe = pd.DataFrame(base)
    df_pinn = pd.DataFrame({**base, "n_parameters": [100] * n})
    sens = pd.DataFrame({
        "mesh_size": [64] * 5,
        "diffusion_coef": [0.001, 0.01, 0.1, 1.0, 10],
        "pinn_l2_error": np.geomspace(1, 0.01, 5),
        "cr_l2_error": np.geomspace(0.5, 0.005, 5),
    })
    runtime = pd.DataFrame({
        "method": ["CRBE", "PINN"] * 4,
        "time_budget": [30, 30, 60, 60, 120, 120, 180, 180],
        "rel_l2_error": np.random.default_rng(0).uniform(0.1, 1, 8),
        "max_error": np.random.default_rng(1).uniform(0.01, 0.1, 8),
        "actual_runtime": [5, 30, 5, 60, 5, 120, 5, 180],
        "epochs_completed": [1, 100, 1, 200, 1, 400, 1, 800],
        "gpu_memory_usage_MB": np.ones(8),
        "cpu_memory_usage_MB": np.ones(8),
    })
    return df_crbe, df_pinn, sens, runtime


def test_generate_all_eight_tables():
    df_crbe, df_pinn, sens, runtime = _fake_results()
    memory = pd.DataFrame({
        "cr_memory_mb": df_crbe["cpu_memory_usage_MB"],
        "pinn_memory_mb": df_pinn["gpu_memory_usage_MB"],
    })
    tables = generate_latex_tables(df_crbe, df_pinn, memory_data=memory,
                                   sensitivity_data=sens,
                                   df_fixed_runtime=runtime)
    assert set(tables) == {
        "convergence_comparison", "convergence_rates",
        "computational_resources", "efficiency_comparison",
        "summary_statistics", "method_characteristics",
        "parameter_sensitivity", "fixed_runtime",
    }
    for t in tables.values():
        assert t.startswith("\\begin{table}")
        assert t.endswith("\\end{table}")


def test_missing_optional_inputs_skip_tables():
    """Defect D8 fixed: absent sensitivity/fixed-runtime data must not
    raise (the reference NameErrors, table_generator.py:282-285)."""
    df_crbe, df_pinn, _, _ = _fake_results()
    tables = generate_latex_tables(df_crbe, df_pinn)
    assert "parameter_sensitivity" not in tables
    assert "fixed_runtime" not in tables
    assert len(tables) == 6


def test_fixed_runtime_rows_pair_by_budget():
    """Mismatched per-method budget sets must pair BY BUDGET (and drop
    unshared budgets), not by row position."""
    df_crbe, df_pinn, _, runtime = _fake_results()
    # CRBE ran {30,60,120,180}; PINN only {60,120,180,300}.
    runtime = runtime.copy()
    runtime.loc[
        (runtime["method"] == "PINN") & (runtime["time_budget"] == 30),
        "time_budget",
    ] = 300
    pinn_err_60 = float(runtime[
        (runtime["method"] == "PINN") & (runtime["time_budget"] == 60)
    ]["rel_l2_error"].iloc[0])
    tables = generate_latex_tables(df_crbe, df_pinn,
                                   df_fixed_runtime=runtime)
    body = tables["fixed_runtime"]
    data_rows = [r for r in body.splitlines()
                 if r.strip() and r.strip()[0].isdigit()]
    budgets = [int(r.split("&")[0]) for r in data_rows]
    assert budgets == [60, 120, 180]  # 30 and 300 unshared -> dropped
    from airpollution_tpu.reporting.table_generator import format_sci

    assert format_sci(pinn_err_60) in data_rows[0]


def test_table6_falls_back_with_honest_label():
    """Without a mesh-64 row, table 6 reports the largest mesh present
    and labels the rows with that size (never 'mesh=64' over other
    data)."""
    df_crbe, df_pinn, _, _ = _fake_results()
    keep = df_crbe["mesh_size"] != 64
    tables = generate_latex_tables(df_crbe[keep].reset_index(drop=True),
                                   df_pinn[keep].reset_index(drop=True))
    body = tables["method_characteristics"]
    assert "mesh=64" not in body
    assert "mesh=128" in body
    t128 = float(df_crbe[df_crbe["mesh_size"] == 128]["train_time"].iloc[0])
    assert f"${t128:.2f}$" in body
