"""Smoke tests for the unified CLI (python -m airpollution_tpu)."""

import json
import os

import numpy as np
import pytest

from airpollution_tpu import cli


@pytest.fixture()
def in_tmp_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _last_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_cli_solve_and_invert_roundtrip(in_tmp_dir, capsys):
    cli.main(["solve", "--mesh_size", "8", "--nt", "8", "--D", "0.3",
              "--save", "obs.npz"])
    res = _last_json(capsys)
    assert res["method"] == "crbe" and np.isfinite(res["rel_l2"])
    assert os.path.exists("obs.npz")

    cli.main(["invert", "--mesh_size", "8", "--nt", "8",
              "--observed", "obs.npz", "--D0", "0.08",
              "--steps", "60", "--lr", "0.15"])
    inv = _last_json(capsys)
    # f32 CLI solve + small mesh: recovery to ~10% is the right bar here
    # (the f64 tests in test_inverse.py pin the tight tolerance).
    assert abs(inv["D_est"] - 0.3) / 0.3 < 0.15
    assert inv["misfit_last"] < inv["misfit_first"]


def test_cli_solve_cn_saves_all_snapshots(in_tmp_dir, capsys):
    cli.main(["solve", "--mesh_size", "6", "--nt", "5", "--order", "2",
              "--extrapolate", "--save", "f.npz", "--save_all"])
    res = _last_json(capsys)
    assert res["order"] == 2
    data = np.load("f.npz")
    assert data["solutions"].shape[0] == 5
    assert "times" in data


def test_cli_pinn_with_levers_and_checkpoint(in_tmp_dir, capsys):
    cli.main(["pinn", "--mesh_size", "6", "--nt", "6", "--epochs", "8",
              "--neurons", "8", "--hidden_layers", "1",
              "--fourier_features", "8", "--adaptive_oversample", "2",
              "--checkpoint_dir", "ck"])
    res = _last_json(capsys)
    assert res["epochs_run"] == 8 and np.isfinite(res["final_loss"])
    assert os.path.exists("ck/pinn_latest.npz")


def test_cli_sourced_solve_and_fit_source_roundtrip(in_tmp_dir, capsys):
    """Production scenario end to end through the CLI: emit a sourced
    trajectory (gaussian_source has no analytical errors -> nulls), then
    recover the emitter from a sparse sensor subset of it."""
    cli.main(["solve", "--problem", "gaussian_source", "--q", "2.0",
              "--xs", "-4.0", "--ys", "2.5", "--sigma_s", "2.0",
              "--mesh_size", "16", "--nt", "17", "--snapshot_every", "4",
              "--save", "src_obs.npz", "--save_all"])
    res = _last_json(capsys)
    assert res["method"] == "crbe" and res["rel_l2"] is None
    data = np.load("src_obs.npz")
    assert data["solutions"].shape[0] == 5  # strided: (nt-1)/4 + 1

    cli.main(["fit-source", "--observed", "src_obs.npz",
              "--mesh_size", "16", "--nt", "17", "--sigma_s", "2.0",
              "--sensors", "40", "--steps", "500", "--lr", "0.12"])
    fit = _last_json(capsys)
    assert fit["n_snapshots"] == 4 and fit["n_sensors"] == 40
    assert abs(fit["q"] - 2.0) / 2.0 < 0.1
    assert abs(fit["xs"] + 4.0) < 0.3 and abs(fit["ys"] - 2.5) < 0.3
    assert fit["misfit_last"] < fit["misfit_first"] * 1e-2


def test_cli_rotating_problem_solve(in_tmp_dir, capsys):
    """--problem rotating: variable-wind solve with exact errors, and
    --reaction folds the decay in (plume x exp(-rt) stays exact)."""
    cli.main(["solve", "--problem", "rotating", "--omega", "0.1",
              "--mesh_size", "16", "--nt", "33"])
    res = _last_json(capsys)
    assert res["method"] == "crbe"
    assert res["rel_l2"] is not None and res["rel_l2"] < 1.0

    cli.main(["solve", "--problem", "rotating", "--omega", "0.1",
              "--reaction", "0.2", "--mesh_size", "16", "--nt", "33"])
    res2 = _last_json(capsys)
    assert res2["rel_l2"] is not None and np.isfinite(res2["rel_l2"])


def test_cli_anisotropic_problem_solve(in_tmp_dir, capsys):
    """--problem anisotropic: tensor-diffusion plume with exact errors."""
    cli.main(["solve", "--problem", "anisotropic", "--Dx", "0.2",
              "--Dy", "0.02", "--mesh_size", "16", "--nt", "33"])
    res = _last_json(capsys)
    assert res["rel_l2"] is not None and np.isfinite(res["rel_l2"])


def test_cli_turning_wind_solve(in_tmp_dir, capsys):
    """--problem turning routes to the quasi-static chunked solver and
    scores against the integrated-trajectory closed form."""
    cli.main(["solve", "--problem", "turning", "--speed", "1.0",
              "--omega", "0.5", "--mesh_size", "12", "--nt", "13",
              "--reassemble_every", "3"])
    res = _last_json(capsys)
    assert res["method"] == "crbe_quasi_static"
    assert res["reassemble_every"] == 3
    assert res["rel_l2"] is not None and np.isfinite(res["rel_l2"])


def test_cli_robin_solve_and_fit_deposition_roundtrip(in_tmp_dir, capsys):
    cli.main(["solve", "--mesh_size", "8", "--nt", "9",
              "--problem", "square_pulse", "--v", "0", "0", "--D", "1.0",
              "--robin", "right=0.5,top=0.5", "--order", "1",
              "--save", "robin_obs.npz", "--save_all"])
    res = _last_json(capsys)
    assert res["method"] == "crbe"
    assert os.path.exists("robin_obs.npz")

    cli.main(["fit-deposition", "--mesh_size", "8", "--nt", "9",
              "--problem", "square_pulse", "--v", "0", "0", "--D", "1.0",
              "--robin", "right=0.5,top=0.5",
              "--observed", "robin_obs.npz",
              "--alpha0", "0.2", "--steps", "60", "--lr", "0.1"])
    fit = _last_json(capsys)
    assert fit["misfit_last"] < fit["misfit_first"]
    # f32 CLI + tiny mesh: both walls recovered to the right magnitude.
    for side in ("right", "top"):
        assert abs(fit["alphas"][side] - 0.5) < 0.2, fit["alphas"]


def test_cli_ensemble_products(in_tmp_dir, capsys):
    cli.main(["ensemble", "--mesh_size", "8", "--nt", "9",
              "--members", "4", "--thresholds", "0.01", "0.05",
              "--save", "ens.npz"])
    res = _last_json(capsys)
    assert res["method"] == "ensemble" and res["members"] == 4
    assert 0.0 <= res["exceedance_mean"]["0.01"] <= 1.0
    data = np.load("ens.npz")
    assert data["mean"].shape == data["std"].shape
    assert data["exceedance"].shape[0] == 2


def test_cli_fit_exchange_roundtrip(in_tmp_dir, capsys):
    """Joint (v_d, c_comp) estimation through the CLI: the observed
    trajectory carries a compensation-point wall (g = v_d c_comp via the
    problem's robin_g delegation is not CLI-expressible, so the truth is
    generated library-side), and fit-exchange recovers both knobs."""
    import jax.numpy as jnp

    from airpollution_tpu.diagnostics import inverse
    from airpollution_tpu.io.checkpoint import save_field
    from airpollution_tpu.mesh import MeshData, create_mesh
    from airpollution_tpu.problems import Domain, SquarePulseProblem

    domain = Domain(T=10.0)
    md = MeshData(create_mesh(8, 20.0), domain, nt=9)
    p = SquarePulseProblem(v=(0.0, 0.0), D=1.0)  # CLI defaults (lo/hi)
    p.robin_sides = {"right": 0.5}
    obs = inverse.solve_snapshots(p, md,
                                  robin_g_const={"right": 0.5 * 0.1})
    save_field("robin_exch.npz", obs,
               times=jnp.asarray(md.time_discr))

    cli.main(["fit-exchange", "--mesh_size", "8", "--nt", "9",
              "--problem", "square_pulse", "--v", "0", "0", "--D", "1.0",
              "--robin", "right=0.5",
              "--observed", "robin_exch.npz",
              "--alpha0", "0.2", "--steps", "400", "--lr", "0.1"])
    fit = _last_json(capsys)
    assert fit["misfit_last"] < fit["misfit_first"]
    ex = fit["exchange"]["right"]
    assert abs(ex["v_d"] - 0.5) < 0.2, ex
    assert abs(ex["c_comp"] - 0.1) < 0.07, ex


def test_cli_fit_ic_roundtrip(in_tmp_dir, capsys):
    cli.main(["solve", "--mesh_size", "10", "--nt", "9", "--sigma", "2.0",
              "--save", "traj.npz", "--save_all"])
    capsys.readouterr()
    cli.main(["fit-ic", "--mesh_size", "10", "--nt", "9", "--sigma", "2.0",
              "--observed", "traj.npz", "--steps", "60",
              "--smoothness", "1e-4", "--save", "u0.npz"])
    res = _last_json(capsys)
    assert res["method"] == "fit_ic"
    assert res["misfit_last"] < res["misfit_first"]
    assert res["rel_l2_vs_problem_ic"] < 1.0  # better than the zero guess
    rec = np.load("u0.npz")["solutions"]
    assert rec.shape == (res["n_dofs"],) and np.isfinite(rec).all()


def test_cli_ensemble_place_sensors(in_tmp_dir, capsys):
    cli.main(["ensemble", "--mesh_size", "8", "--nt", "7", "--members",
              "6", "--place_sensors", "3", "--save", "ens.npz"])
    res = _last_json(capsys)
    assert len(res["stations"]) == 3
    assert len(set(res["stations"])) == 3
    r0, r_last = res["station_var_reduction_first_last"]
    assert r0 >= r_last >= 0
    data = np.load("ens.npz")
    assert list(data["stations"]) == res["stations"]
    assert data["station_var_reduction"].shape == (3,)


def test_cli_solve_with_obstacle(in_tmp_dir, capsys):
    cli.main(["solve", "--mesh_size", "10", "--nt", "6",
              "--obstacle", "-4", "4", "-4", "4",
              "--save", "obst.npz", "--save_all"])
    res = _last_json(capsys)
    assert res["method"] == "crbe" and np.isfinite(res["rel_l2"])
    import jax.numpy as jnp

    from airpollution_tpu.mesh import MeshData, create_mesh
    from airpollution_tpu.models.crbe import obstacle_masks
    from airpollution_tpu.problems import Domain, Problem

    p = Problem()
    p.obstacles = ((-4.0, 4.0, -4.0, 4.0),)
    md = MeshData(create_mesh(10, 20.0), Domain(), nt=6)
    _, dead = obstacle_masks(md, p)
    sols = np.load("obst.npz")["solutions"]
    assert np.abs(sols[1:, np.asarray(dead)]).max() == 0.0


def test_cli_fno_trains_and_saves(in_tmp_dir, capsys):
    cli.main(["fno", "--mesh_size", "13", "--nt", "8", "--n_train", "12",
              "--n_test", "4", "--modes", "4", "--width", "8",
              "--depth", "2", "--epochs", "40", "--batch", "4",
              "--save", "fno.npz"])
    res = _last_json(capsys)
    assert res["method"] == "fno" and res["data_parallel"] is False
    assert np.isfinite(res["rel_l2_holdout_vs_fem"])
    assert res["loss_last"] < res["loss_first"]
    assert os.path.exists("fno.npz")


def test_cli_fno_data_parallel(in_tmp_dir, capsys):
    cli.main(["fno", "--mesh_size", "13", "--nt", "8", "--n_train", "12",
              "--n_test", "4", "--modes", "4", "--width", "8",
              "--depth", "2", "--epochs", "20", "--batch", "6",
              "--data_parallel"])
    res = _last_json(capsys)
    # batch 6 rounds up to a multiple of the 8 virtual devices.
    assert res["data_parallel"] is True and res["batch"] == 8
    assert res["n_devices"] == 8
    assert np.isfinite(res["loss_last"])


def test_cli_multispecies_chain(in_tmp_dir, capsys):
    """multispecies subcommand: expm-mixture oracle errors on the scan
    route, and the fused Strang route (sourced chain, canvas stripe
    kernel) reports finite masses."""
    cli.main(["multispecies", "--mesh_size", "10", "--nt", "9"])
    res = _last_json(capsys)
    assert res["method"] == "multispecies" and res["n_species"] == 3
    assert np.isfinite(res["rel_l2_total"])
    assert len(res["final_masses"]) == 3

    cli.main(["multispecies", "--mesh_size", "10", "--nt", "9",
              "--matvec_impl", "fused_hbm", "--solver_method",
              "chebyshev", "--splitting", "strang", "--source_q", "1.5",
              "--rates", "0.3"])
    res = _last_json(capsys)
    assert res["splitting"] == "strang" and res["n_species"] == 2
    assert "rel_l2_total" not in res  # sourced: no closed form
    assert all(np.isfinite(m) for m in res["final_masses"])
