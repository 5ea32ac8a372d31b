"""End-to-end smoke tests for the experiment drivers (CLI mains with tiny
configs) and the reporting pipeline over their CSV outputs."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def in_tmp_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_crbe_driver_smoke(in_tmp_dir):
    from experiments import crbe_experiments

    df = crbe_experiments.main(["--mesh_sizes", "4", "8"])
    assert list(df["mesh_size"]) == [4, 8]
    assert (df["rel_l2_error"] > 0).all()
    out = "experimental_results/crbe/df_crbe_training_results.csv"
    assert os.path.exists(out)
    cols = set(pd.read_csv(out).columns)
    # Reference schema columns (crbe_experiments.py:71-83).
    assert {"mesh_size", "n_dofs", "n_boundary_dofs", "l2_error",
            "rel_l2_error", "max_error", "train_time",
            "gpu_memory_usage_MB", "cpu_memory_usage_MB",
            "number_of_collocation_points"} <= cols


def test_pinn_driver_smoke(in_tmp_dir):
    from experiments import pinn_experiments

    df = pinn_experiments.main(
        ["--mesh_sizes", "4", "--epochs", "3", "--activation", "tanh"]
    )
    assert len(df) == 1
    cols = set(df.columns)
    assert {"mesh_size", "rel_l2_error", "final_loss", "n_parameters",
            "train_time"} <= cols
    assert os.path.exists(
        "experimental_results/pinn/df_pinn_training_results.csv"
    )


def test_hpo_driver_smoke(in_tmp_dir):
    from experiments import optimal_hyperparams_search

    df = optimal_hyperparams_search.main(
        ["--n_trials", "2", "--epochs", "2", "--n_jobs", "1"]
    )
    assert len(df) == 2
    assert {"params_lr", "params_lambda_pde", "value"} <= set(df.columns)
    assert os.path.exists("optuna_pinn_results_32.csv")


def test_problem3_script_smoke(in_tmp_dir):
    from scripts import problem3

    l2, mx = problem3.main(["--epochs", "3", "--m_size", "8"])
    assert np.isfinite(l2) and np.isfinite(mx)


def test_accuracy_levers_script_smoke(in_tmp_dir):
    from scripts import pinn_accuracy_levers

    rows = pinn_accuracy_levers.main([
        "--epochs", "2", "--mesh_size", "6",
        "--variants", "base", "all",
        "--out", "out/levers.csv",
    ])
    assert {r["variant"] for r in rows} == {"base", "all"}
    assert all(np.isfinite(r["rel_l2"]) for r in rows)
    assert os.path.exists("out/levers.csv")


def test_scaling_script_smoke(in_tmp_dir):
    from scripts import tpu_scaling_study

    # Tiny size/horizon so the scan path runs in seconds on CPU.
    tpu_scaling_study.main(["--sizes", "6", "--nt", "4",
                            "--out", "out/scal.csv"])
    df = pd.read_csv("out/scal.csv")
    assert df.loc[0, "mesh_size"] == 6
    assert np.isfinite(df.loc[0, "rel_l2"])
    # Reruns MERGE rows by mesh size instead of clobbering the table.
    tpu_scaling_study.main(["--sizes", "8", "--nt", "4",
                            "--out", "out/scal.csv"])
    df2 = pd.read_csv("out/scal.csv")
    assert list(df2["mesh_size"]) == [6, 8]
