"""Ensemble forecasting (diagnostics/ensemble.py).

Member solves are one vmap over stacked problem pytrees (assembly
included) — the oracle is the serial solver run per member. Statistics
and exceedance maps are checked against their numpy definitions, and the
trial-sharded variant must equal the unsharded one exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpollution_tpu.diagnostics import ensemble_forecast, stack_problems
from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver
from airpollution_tpu.problems import Domain, Problem, SquarePulseProblem


def _mesh(nt=9, ms=8):
    return MeshData(create_mesh(ms, 20.0), Domain(T=2.0), nt=nt,
                    dtype=jnp.float64)


def test_members_match_serial_solver():
    domain = Domain(T=2.0)
    md = _mesh()
    Ds = [0.05, 0.1, 0.4]
    problems = [Problem(v=(1.0, 0.5), D=d) for d in Ds]
    out = ensemble_forecast(md, domain, problems)
    assert out["members"].shape == (3, md.number_of_segments)
    for k, d in enumerate(Ds):
        s = CRBESolver(domain, Problem(v=(1.0, 0.5), D=d), md,
                       matvec_impl="ell")
        ref = s.solve(store_solutions=False)[0]
        np.testing.assert_allclose(np.asarray(out["members"][k]),
                                   np.asarray(ref), atol=1e-10)


def test_statistics_and_exceedance_definitions():
    domain = Domain(T=2.0)
    md = _mesh()
    problems = [Problem(D=d) for d in (0.05, 0.1, 0.2, 0.4)]
    taus = (0.01, 0.05)
    out = ensemble_forecast(md, domain, problems, thresholds=taus)
    m = np.asarray(out["members"])
    np.testing.assert_allclose(np.asarray(out["mean"]), m.mean(0),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out["std"]), m.std(0, ddof=1),
                               rtol=1e-9, atol=1e-15)
    exc = np.asarray(out["exceedance"])
    assert exc.shape == (2, md.number_of_segments)
    for i, tau in enumerate(taus):
        np.testing.assert_allclose(exc[i], (m > tau).mean(0), rtol=1e-12)


def test_identical_members_have_zero_spread():
    domain = Domain(T=2.0)
    md = _mesh()
    out = ensemble_forecast(md, domain, [Problem(D=0.1)] * 3)
    np.testing.assert_allclose(np.asarray(out["std"]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["members"][0]),
                               np.asarray(out["members"][2]), atol=0)


def test_single_member_std_is_zero_not_nan():
    domain = Domain(T=2.0)
    md = _mesh()
    out = ensemble_forecast(md, domain, [Problem(D=0.1)])
    assert np.isfinite(np.asarray(out["std"])).all()
    np.testing.assert_allclose(np.asarray(out["std"]), 0.0, atol=0)


def test_sharded_matches_unsharded():
    domain = Domain(T=2.0)
    md = _mesh()
    problems = [Problem(D=d) for d in (0.05, 0.1, 0.2)]  # 3 on 8 devices
    base = ensemble_forecast(md, domain, problems, thresholds=(0.02,))
    mesh = jax.make_mesh((len(jax.devices()),), ("trial",))
    sharded = ensemble_forecast(md, domain, problems, thresholds=(0.02,),
                                mesh=mesh)
    for key in ("members", "mean", "std", "exceedance"):
        np.testing.assert_allclose(np.asarray(sharded[key]),
                                   np.asarray(base[key]), atol=1e-11)


def test_mixed_problem_classes_rejected():
    domain = Domain(T=2.0)
    md = _mesh()
    with pytest.raises(ValueError, match="share a problem class"):
        ensemble_forecast(md, domain, [Problem(), SquarePulseProblem()])
    with pytest.raises(ValueError, match="empty"):
        ensemble_forecast(md, domain, [])


def test_stack_problems_stacks_leaves():
    ps = [Problem(D=d) for d in (0.1, 0.2)]
    batched = stack_problems(ps)
    np.testing.assert_allclose(np.asarray(batched.D), [0.1, 0.2])
    assert batched.v.shape == (2, 2)


def test_enkf_update_matches_numpy_replica():
    """The jitted EnKF analysis equals the textbook perturbed-observation
    update computed in numpy with the identical noise draws."""
    from airpollution_tpu.diagnostics import enkf_update

    rng = np.random.default_rng(7)
    K, n, m = 12, 40, 5
    X = jnp.asarray(rng.standard_normal((K, n)))
    sensors = [3, 11, 19, 27, 35]
    y = jnp.asarray(rng.standard_normal(m))
    obs_std = 0.25
    key = jax.random.PRNGKey(42)
    Xa = np.asarray(enkf_update(X, y, sensors, obs_std, key))

    eps = np.asarray(obs_std * jax.random.normal(key, (K, m),
                                                 jnp.float64))
    Xn = np.asarray(X)
    S = Xn[:, sensors]
    A = Xn - Xn.mean(0)
    As = S - S.mean(0)
    C = As.T @ As / (K - 1) + obs_std ** 2 * np.eye(m)
    PHt = A.T @ As / (K - 1)
    gain = PHt @ np.linalg.inv(C)
    expect = Xn + ((np.asarray(y)[None] + eps) - S) @ gain.T
    np.testing.assert_allclose(Xa, expect, rtol=1e-9, atol=1e-12)


def test_enkf_cycle_pulls_ensemble_toward_truth():
    """Forecast a biased ensemble, assimilate noisy station readings of
    the truth: the analysis mean gets closer to the truth field and the
    station spread shrinks."""
    from airpollution_tpu.diagnostics import enkf_update, ensemble_forecast
    from airpollution_tpu.models.crbe import CRBESolver

    domain = Domain(T=2.0)
    md = _mesh(nt=9, ms=10)
    truth_problem = Problem(v=(1.0, 0.5), D=0.25)
    s = CRBESolver(domain, truth_problem, md, matvec_impl="ell")
    truth = np.asarray(s.solve(store_solutions=False)[0])

    rng = np.random.default_rng(3)
    # Wide prior bracketing the truth: with K=24 members the analysis
    # subspace (rank K-1) can represent the correction; a biased prior
    # that excludes the truth would cap the achievable update.
    Ds = np.exp(rng.normal(np.log(0.18), 0.5, 24))
    out = ensemble_forecast(md, domain,
                            [Problem(v=(1.0, 0.5), D=float(d))
                             for d in Ds])
    X = out["members"]
    sensors = rng.choice(md.number_of_segments, 48, replace=False)
    obs_std = 0.002
    y = truth[sensors] + rng.normal(0, obs_std, sensors.shape)
    Xa = enkf_update(X, jnp.asarray(y), [int(i) for i in sensors],
                     obs_std, jax.random.PRNGKey(0))

    err_f = np.linalg.norm(np.asarray(X).mean(0) - truth)
    err_a = np.linalg.norm(np.asarray(Xa).mean(0) - truth)
    assert err_a < 0.7 * err_f, (err_a, err_f)
    spread_f = np.asarray(X).std(0)[sensors].mean()
    spread_a = np.asarray(Xa).std(0)[sensors].mean()
    assert spread_a < spread_f


def test_forecast_restart_matches_full_solve():
    """u0_members + t0 make the forecast restartable: two chained windows
    reproduce one serial solve over the full horizon exactly."""
    dom_w = Domain(T=1.0)
    md_w = MeshData(create_mesh(8, 20.0), dom_w, nt=5, dtype=jnp.float64)
    probs = [SquarePulseProblem(v=(1.0, 0.3), D=0.1),
             SquarePulseProblem(v=(0.8, 0.5), D=0.2)]
    out1 = ensemble_forecast(md_w, dom_w, probs)
    out2 = ensemble_forecast(md_w, dom_w, probs,
                             u0_members=out1["members"], t0=1.0)

    dom_f = Domain(T=2.0)
    md_f = MeshData(create_mesh(8, 20.0), dom_f, nt=9, dtype=jnp.float64)
    for k, p in enumerate(probs):
        s = CRBESolver(dom_f, p, md_f, matvec_impl="ell")
        ref = np.asarray(s.solve(store_solutions=False)[0])
        np.testing.assert_allclose(np.asarray(out2["members"][k]), ref,
                                   atol=1e-12)


def test_forecast_u0_members_shape_validated():
    dom = Domain(T=1.0)
    md = MeshData(create_mesh(6, 20.0), dom, nt=3, dtype=jnp.float64)
    probs = [Problem(D=0.1), Problem(D=0.2)]
    bad = jnp.zeros((3, md.number_of_segments))
    with pytest.raises(ValueError, match="u0_members"):
        ensemble_forecast(md, dom, probs, u0_members=bad)


def test_enkf_inflation_matches_manual_anomaly_scaling():
    """inflation=lam equals scaling the forecast anomalies by lam first
    and then running the plain (inflation=1) update with the same key."""
    from airpollution_tpu.diagnostics import enkf_update

    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.normal(size=(12, 40)))
    sensors = [3, 11, 25, 33]
    y = jnp.asarray(rng.normal(size=4))
    key = jax.random.PRNGKey(9)
    lam = 1.15
    Xa = enkf_update(X, y, sensors, 0.05, key, inflation=lam)
    X_inflated = X.mean(0) + lam * (X - X.mean(0))
    Xb = enkf_update(X_inflated, y, sensors, 0.05, key)
    np.testing.assert_allclose(np.asarray(Xa), np.asarray(Xb), rtol=1e-10,
                               atol=1e-12)


def test_cycling_assimilation_beats_free_run():
    """Three EnKF forecast-analysis cycles on a perturbed square-pulse
    ensemble: the assimilated ensemble mean ends closer to the truth
    than the free-running twin (scripts/da_cycling_demo.py in miniature)."""
    from airpollution_tpu.diagnostics import enkf_update
    from airpollution_tpu.models.crbe import CRBESolver

    rng = np.random.default_rng(0)
    truth_problem = SquarePulseProblem(v=(1.0, 0.5), D=0.1)
    n_cycles, spw = 3, 4
    dom_full = Domain(T=3.0)
    md_full = MeshData(create_mesh(12, 20.0), dom_full,
                       nt=n_cycles * spw + 1, dtype=jnp.float64)
    truth = np.asarray(
        CRBESolver(dom_full, truth_problem, md_full).solve(
            store_solutions=True))

    dom_w = Domain(T=1.0)
    md_w = MeshData(create_mesh(12, 20.0), dom_w, nt=spw + 1,
                    dtype=jnp.float64)
    mids = np.asarray(md_w.midpoints)
    K = 12
    probs = [SquarePulseProblem(
        v=(1.0 + 0.25 * rng.standard_normal(),
           0.5 + 0.25 * rng.standard_normal()),
        D=0.1 * np.exp(0.3 * rng.standard_normal())) for _ in range(K)]
    shifts = 1.5 * rng.standard_normal((K, 2))
    X0 = np.stack([
        np.where((mids[:, 0] >= 8 + s[0]) & (mids[:, 0] <= 12 + s[0])
                 & (mids[:, 1] >= 8 + s[1]) & (mids[:, 1] <= 12 + s[1]),
                 1.0, 0.0)
        for s in shifts])
    track = ((mids[:, 0] >= 5) & (mids[:, 0] <= 19)
             & (mids[:, 1] >= 5) & (mids[:, 1] <= 17))
    candidates = np.flatnonzero(track)
    sensors = np.sort(rng.choice(candidates, min(32, len(candidates)),
                                 replace=False))
    obs_std = 0.02

    X, X_free = jnp.asarray(X0), jnp.asarray(X0)
    key = jax.random.PRNGKey(7)
    for c in range(n_cycles):
        out = ensemble_forecast(md_w, dom_w, probs, u0_members=X,
                                t0=float(c))
        out_free = ensemble_forecast(md_w, dom_w, probs, u0_members=X_free,
                                     t0=float(c))
        X_f, X_free = out["members"], out_free["members"]
        u_true = truth[(c + 1) * spw]
        y = u_true[sensors] + obs_std * rng.standard_normal(len(sensors))
        key, sub = jax.random.split(key)
        X = enkf_update(X_f, jnp.asarray(y), sensors, obs_std, sub,
                        inflation=1.1)
        rmse_a = float(np.sqrt(np.mean(
            (np.asarray(X).mean(0) - u_true) ** 2)))
        rmse_free = float(np.sqrt(np.mean(
            (np.asarray(X_free).mean(0) - u_true) ** 2)))
    assert rmse_a < 0.7 * rmse_free, (rmse_a, rmse_free)


def test_place_sensors_numpy_replica_and_mode_spreading():
    """First pick maximizes ||P[:,c]||^2/(var_c+obs_var) (numpy replica);
    subsequent picks spread across the ensemble's independent modes
    instead of piling onto the variance maximum (EnSRF deflation)."""
    from airpollution_tpu.diagnostics import place_sensors

    rng = np.random.default_rng(0)
    K, n = 20, 200
    A = np.zeros((K, n))
    modes = [(10, 3.0), (50, 2.0), (120, 1.0)]
    for loc, amp in modes:
        bump = np.exp(-0.5 * ((np.arange(n) - loc) / 4.0) ** 2)
        A += amp * np.outer(rng.standard_normal(K), bump)
    X = A + 0.5
    picks, reds = place_sensors(X, 4, obs_std=0.05)

    An = X - X.mean(0)
    P = An.T @ An / (K - 1)
    score = (P ** 2).sum(0) / (np.diag(P) + 0.05 ** 2)
    assert picks[0] == int(np.argmax(score))
    nearest = sorted(min(range(3), key=lambda i: abs(picks[j] - modes[i][0]))
                     for j in range(3))
    assert nearest == [0, 1, 2], (picks, nearest)
    assert reds == sorted(reds, reverse=True)  # diminishing returns
    assert reds[3] < 0.01 * reds[0]  # 3 modes -> 4th pick is noise


def test_place_sensors_candidate_restriction_and_validation():
    from airpollution_tpu.diagnostics import place_sensors

    rng = np.random.default_rng(1)
    X = rng.standard_normal((8, 30))
    cands = [2, 5, 11, 17, 23]
    picks, _ = place_sensors(X, 3, obs_std=0.1, candidate_indices=cands)
    assert set(picks) <= set(cands) and len(set(picks)) == 3
    with pytest.raises(ValueError, match="candidate"):
        place_sensors(X, 6, obs_std=0.1, candidate_indices=cands)
    with pytest.raises(ValueError, match="members"):
        place_sensors(X[:1], 2, obs_std=0.1)
    with pytest.raises(ValueError, match="n_sensors"):
        place_sensors(X, 0, obs_std=0.1)


def test_greedy_network_beats_random_in_enkf_analysis():
    """End-to-end observing-system design: a greedily-placed network
    yields a better EnKF analysis of the truth than random networks of
    the same size."""
    from airpollution_tpu.diagnostics import enkf_update, place_sensors
    from airpollution_tpu.models.crbe import CRBESolver

    domain = Domain(T=2.0)
    md = _mesh(nt=9, ms=10)
    truth_problem = Problem(v=(1.0, 0.5), D=0.25)
    truth = np.asarray(
        CRBESolver(domain, truth_problem, md,
                   matvec_impl="ell").solve(store_solutions=False)[0])

    rng = np.random.default_rng(3)
    Ds = np.exp(rng.normal(np.log(0.18), 0.5, 24))
    out = ensemble_forecast(md, domain,
                            [Problem(v=(1.0, 0.5), D=float(d))
                             for d in Ds])
    X = out["members"]
    obs_std = 0.002
    m = 12

    def analysis_err(sensors, key):
        y = truth[np.asarray(sensors)] + rng.normal(
            0, obs_std, len(sensors))
        Xa = enkf_update(X, jnp.asarray(y), [int(i) for i in sensors],
                         obs_std, key)
        return float(np.linalg.norm(np.asarray(Xa).mean(0) - truth))

    greedy, _ = place_sensors(X, m, obs_std=obs_std)
    err_greedy = analysis_err(greedy, jax.random.PRNGKey(0))
    rand_errs = [
        analysis_err(rng.choice(md.number_of_segments, m, replace=False),
                     jax.random.PRNGKey(k))
        for k in range(1, 4)
    ]
    assert err_greedy < np.mean(rand_errs), (err_greedy, rand_errs)
