"""Differentiable-solve and inverse-problem tests (CPU, float64)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpollution_tpu.diagnostics import inverse
from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.problems import Domain, Problem


def _mesh(ms=8, nt=8):
    return MeshData(create_mesh(ms, 20.0), Domain(), nt=nt,
                    dtype=jnp.float64)


def test_grad_through_solve_matches_finite_differences():
    """d/dD of a misfit functional through the FULL time loop (assembly,
    custom_linear_solve steps, boundary lift) against central differences.
    This exercises the implicit-function-theorem VJP end to end."""
    md = _mesh()
    target = inverse.solve_final_state(Problem(D=0.25), md)

    def loss(D):
        u = inverse.solve_final_state(Problem(D=D), md)
        return jnp.mean((u - target) ** 2)

    D = 0.1
    g = float(jax.grad(loss)(jnp.asarray(D, jnp.float64)))
    h = 1e-5
    fd = (float(loss(D + h)) - float(loss(D - h))) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_grad_wrt_velocity():
    md = _mesh()
    target = inverse.solve_final_state(Problem(), md)

    def loss(v):
        u = inverse.solve_final_state(Problem(v=v), md)
        return jnp.mean((u - target) ** 2)

    v0 = jnp.asarray([0.7, 0.9], jnp.float64)
    g = np.asarray(jax.grad(loss)(v0))
    h = 1e-5
    for d in range(2):
        e = np.zeros(2)
        e[d] = h
        fd = (float(loss(v0 + e)) - float(loss(v0 - e))) / (2 * h)
        np.testing.assert_allclose(g[d], fd, rtol=1e-5)


def test_fit_diffusion_recovers_true_value():
    """Generate observations with D=0.3, start the fit at D=0.05 (6x off)
    and require convergence to a few percent."""
    md = _mesh()
    u_obs = inverse.solve_final_state(Problem(D=0.3), md)
    D_est, losses = inverse.fit_diffusion(u_obs, md, D0=0.05, steps=100,
                                          lr=0.1)
    assert losses[-1] < losses[0] * 1e-3
    np.testing.assert_allclose(D_est, 0.3, rtol=0.02)


def test_differentiable_primal_matches_plain_solver():
    """differentiable=True must not change the primal numbers."""
    from airpollution_tpu.models.crbe import CRBESolver

    md = _mesh(ms=10, nt=10)
    s = CRBESolver(Domain(), Problem(), md, matvec_impl="ell",
                   solver_tol=1e-12, solver_maxiter=200)
    u_plain = np.asarray(s.solve(store_solutions=False))[0]
    u_diff = np.asarray(
        inverse.solve_final_state(Problem(), md, tol=1e-12, maxiter=200)
    )
    np.testing.assert_allclose(u_diff, u_plain, atol=1e-10)


def test_joint_dv_recovery_from_trajectory():
    """Final-time-only observations under-determine (D, v); trajectory
    snapshots make the joint fit well-posed. Recover both from a far-off
    start on a small mesh."""
    md = _mesh(ms=8, nt=16)
    idx = [4, 8, 12, 15]
    obs = inverse.solve_snapshots(Problem(v=(0.8, 0.6), D=0.25), md,
                                  indices=idx)

    def make_problem(params):
        return Problem(v=params["v"], D=jnp.exp(params["log_d"]))

    init = {"log_d": jnp.log(jnp.asarray(0.05)),
            "v": jnp.asarray([1.5, -0.2])}
    params, losses = inverse.fit_parameters(
        obs, md, make_problem, init, snapshot_indices=idx,
        steps=250, lr=0.05,
    )
    assert losses[-1] < losses[0] * 1e-4
    np.testing.assert_allclose(float(jnp.exp(params["log_d"])), 0.25,
                               rtol=0.1)
    np.testing.assert_allclose(np.asarray(params["v"]), [0.8, 0.6],
                               atol=0.1)


def test_solve_final_state_vmaps_over_parameters():
    """The differentiable solve composes with vmap: one compiled program
    evaluates a batch of diffusion coefficients (multi-start fits and
    identifiability sweeps ride this)."""
    md = _mesh(ms=6, nt=6)
    Ds = jnp.asarray([0.05, 0.1, 0.4], jnp.float64)
    batch = jax.vmap(
        lambda d: inverse.solve_final_state(Problem(D=d), md,
                                            tol=1e-10, maxiter=100)
    )(Ds)
    assert batch.shape == (3, md.number_of_segments)
    single = inverse.solve_final_state(Problem(D=0.1), md,
                                       tol=1e-10, maxiter=100)
    np.testing.assert_allclose(np.asarray(batch[1]), np.asarray(single),
                               atol=1e-8)


def test_inverse_on_unstructured_mesh():
    """Unstructured (jittered-Delaunay) meshes take the ELL branch of the
    differentiable solve; gradients must still match finite differences."""
    from airpollution_tpu.mesh import create_unstructured_mesh

    md = MeshData(create_unstructured_mesh(7, 20.0, seed=3), Domain(),
                  nt=6, dtype=jnp.float64)
    assert md.structured_n is None
    target = inverse.solve_final_state(Problem(D=0.2), md, maxiter=300)

    def loss(D):
        u = inverse.solve_final_state(Problem(D=D), md, maxiter=300)
        return jnp.mean((u - target) ** 2)

    D = 0.08
    g = float(jax.grad(loss)(jnp.asarray(D, jnp.float64)))
    h = 1e-5
    fd = (float(loss(D + h)) - float(loss(D - h))) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=1e-4)


def test_source_gradients_match_finite_differences():
    """d(misfit)/d(q, xs) through the full sourced time loop — the source
    term enters the RHS of every implicit step (models/crbe.py rhs), so
    this exercises the adjoint of the emission path end to end."""
    from airpollution_tpu.problems import GaussianSourceProblem

    md = _mesh(ms=8, nt=8)
    target = inverse.solve_final_state(
        GaussianSourceProblem(q=2.0, xs=-2.0, ys=1.0, sigma_s=2.0), md)

    def loss(q, xs):
        u = inverse.solve_final_state(
            GaussianSourceProblem(q=q, xs=xs, ys=0.0, sigma_s=2.0), md)
        return jnp.mean((u - target) ** 2)

    q, xs = 1.3, 0.5
    gq = float(jax.grad(loss, argnums=0)(jnp.float64(q), jnp.float64(xs)))
    gx = float(jax.grad(loss, argnums=1)(jnp.float64(q), jnp.float64(xs)))
    h = 1e-5
    fd_q = (float(loss(q + h, xs)) - float(loss(q - h, xs))) / (2 * h)
    fd_x = (float(loss(q, xs + h)) - float(loss(q, xs - h))) / (2 * h)
    np.testing.assert_allclose(gq, fd_q, rtol=1e-5)
    np.testing.assert_allclose(gx, fd_x, rtol=1e-5)


def test_fit_source_recovers_rate_and_location_from_sensors():
    """Emission-source identification from a sparse sensor network:
    observations are trajectory snapshots gathered at ~10% of the DOF
    midpoints; recover (q, xs, ys) from a wrong rate and location."""
    from airpollution_tpu.problems import GaussianSourceProblem

    md = _mesh(ms=12, nt=16)
    idx = [4, 8, 12, 15]
    true = dict(q=2.0, xs=-2.0, ys=1.5, sigma_s=1.5)
    full = inverse.solve_snapshots(
        GaussianSourceProblem(**true), md, indices=idx)
    rng = np.random.default_rng(0)
    sensors = np.sort(rng.choice(md.number_of_segments, 40, replace=False))
    obs = full[:, jnp.asarray(sensors)]

    result, losses = inverse.fit_source(
        obs, md, snapshot_indices=idx, sensor_indices=sensors,
        sigma_s=true["sigma_s"], q0=1.0, xy0=(0.0, 0.0),
        steps=250, lr=0.1)
    assert losses[-1] < losses[0] * 1e-3
    np.testing.assert_allclose(result["q"], true["q"], rtol=0.05)
    np.testing.assert_allclose(result["xs"], true["xs"], atol=0.15)
    np.testing.assert_allclose(result["ys"], true["ys"], atol=0.15)


def test_sourced_solver_manufactured_solution_convergence():
    """Method of manufactured solutions for the sourced RHS path: pick
    c*(x,y,t) = exp(-t/20) cos(pi x / 2Lx) cos(pi y / 2Ly) (zero
    Dirichlet on the box), set s = dc*/dt + v.grad(c*) - D lap(c*), and
    require the CRBE error against c* to shrink under refinement. This
    is the oracle for the corrected lumped-mass source quadrature: the
    reference's raw pointwise add (defect D10, crbe.py:391-394) leaves
    the error O(1) and non-convergent on this problem."""
    from airpollution_tpu.models.crbe import CRBESolver
    from airpollution_tpu.problems import AdDifProblem, Domain

    dom = Domain()
    kx = jnp.pi / (2 * dom.Lx)
    ky = jnp.pi / (2 * dom.Ly)
    lam = 0.05

    def exact(xyt):
        x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
        return jnp.exp(-lam * t) * jnp.cos(kx * x) * jnp.cos(ky * y)

    class MMSProblem(AdDifProblem):
        zero_source = False

        def __init__(self):
            super().__init__(jnp.asarray([1.0, 0.5]), 0.1)

        def initial_condition_fn(self, xy):
            t0 = jnp.zeros(xy.shape[:-1] + (1,), xy.dtype)
            return exact(jnp.concatenate([xy, t0], axis=-1))

        def boundary_fn(self, xyt):
            return jnp.zeros_like(xyt[..., 0])

        def source_term(self, xyt):
            x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
            c = exact(xyt)
            dct = -lam * c
            dcx = -kx * jnp.exp(-lam * t) * jnp.sin(kx * x) \
                * jnp.cos(ky * y)
            dcy = -ky * jnp.exp(-lam * t) * jnp.cos(kx * x) \
                * jnp.sin(ky * y)
            lap = -(kx**2 + ky**2) * c
            return dct + self.v[0] * dcx + self.v[1] * dcy - self.D * lap

    errs = {}
    for ms in (8, 16, 32):
        md = _mesh(ms=ms, nt=64)
        s = CRBESolver(dom, MMSProblem(), md, time_scheme_order=2,
                       solver_tol=1e-11, solver_maxiter=300)
        u = np.asarray(s.solve(store_solutions=False))[0]
        xyt = np.hstack([np.asarray(md.midpoints),
                         np.full((md.number_of_segments, 1), dom.T)])
        ref = np.asarray(exact(jnp.asarray(xyt)))
        errs[ms] = np.linalg.norm(u - ref) / np.linalg.norm(ref)
    # Spatial convergence for the smooth manufactured solution (CN keeps
    # the temporal error below the spatial one at nt=64).
    assert errs[16] < errs[8] / 2.0, errs
    assert errs[32] < errs[16] / 2.0, errs


def test_multi_start_fit_via_vmap():
    """The whole Adam fit step vmaps over a batch of initializations: one
    compiled program runs N independent fits in lockstep (multi-start
    robustness against non-convex misfits)."""
    import optax

    md = _mesh(ms=8, nt=8)
    obs = inverse.solve_final_state(Problem(D=0.3), md)

    def loss_fn(log_d):
        u = inverse.solve_final_state(Problem(D=jnp.exp(log_d)), md)
        return jnp.mean((u - obs) ** 2)

    opt = optax.adam(0.1)

    @jax.jit
    @jax.vmap
    def step(log_d, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(log_d)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(log_d, upd), opt_state, loss

    log_d = jnp.log(jnp.asarray([0.05, 0.1, 1.0, 3.0], jnp.float64))
    opt_state = jax.vmap(opt.init)(log_d)
    for _ in range(80):
        log_d, opt_state, losses = step(log_d, opt_state)
    D_est = np.exp(np.asarray(log_d))
    # Every start converges to the true coefficient.
    np.testing.assert_allclose(D_est, 0.3, rtol=0.05)


def test_u0_override_matches_default_path():
    """Passing the problem's own IC as an explicit u0 is a no-op."""
    md = _mesh(ms=8, nt=8)
    prob = Problem(v=(1.0, 0.5), D=0.1, sigma=2.0)
    u0 = jnp.asarray(prob.initial_condition_fn(md.midpoints))
    a = inverse.solve_final_state(prob, md)
    b = inverse.solve_final_state(prob, md, u0=u0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_initial_condition_twin_recovery():
    """4D-Var twin experiment: recover a Gaussian-blob initial field from
    full-field snapshots of its later evolution (transport known)."""
    md = _mesh(ms=12, nt=12)
    prob = Problem(v=(1.0, 0.5), D=0.1, sigma=2.0)
    u0_true = jnp.asarray(prob.initial_condition_fn(md.midpoints))
    idx = [1, 2, 4, 8]
    obs = inverse.solve_snapshots(prob, md, indices=idx)
    u0_est, losses = inverse.fit_initial_condition(
        obs, md, prob, snapshot_indices=idx, steps=150, lr=0.05,
        smoothness=1e-4)
    rel = float(jnp.linalg.norm(u0_est - u0_true)
                / jnp.linalg.norm(u0_true))
    assert rel < 0.05, rel
    assert losses[-1] < 1e-2 * losses[0], (losses[0], losses[-1])


def test_fit_initial_condition_nonnegative_and_sensors():
    """The softplus reparameterization keeps the estimate nonnegative,
    and the sensor-network observation operator accepts (k, m) data."""
    md = _mesh(ms=8, nt=8)
    prob = Problem(v=(1.0, 0.5), D=0.1, sigma=2.0)
    idx = [1, 3]
    sensors = list(range(0, md.number_of_segments, 3))
    obs = inverse.solve_snapshots(prob, md, indices=idx)[
        :, jnp.asarray(sensors)]
    u0_est, losses = inverse.fit_initial_condition(
        obs, md, prob, snapshot_indices=idx, sensor_indices=sensors,
        steps=25, lr=0.1, smoothness=1e-3, nonnegative=True)
    assert u0_est.shape == (md.number_of_segments,)
    assert bool((u0_est >= 0).all())
    assert losses[-1] < losses[0]


def test_fit_initial_condition_requires_snapshots():
    md = _mesh(ms=6, nt=6)
    prob = Problem()
    with pytest.raises(ValueError, match="snapshot_indices"):
        inverse.fit_initial_condition(jnp.zeros((0, 1)), md, prob,
                                      snapshot_indices=[])


def test_posterior_covariance_linear_oracle_and_mc_coverage():
    """For a model LINEAR in the parameter (source rate q), the
    Gauss-Newton posterior is exact: std = obs_std/||g|| with g the
    unit-rate prediction, and it matches the Monte-Carlo spread of
    closed-form least-squares estimates over noisy replicas."""
    from airpollution_tpu.problems import GaussianSourceProblem

    md = _mesh(ms=8, nt=8)
    idx = [2, 4, 7]
    sens = list(range(0, md.number_of_segments, 5))

    def make_problem(params):
        return GaussianSourceProblem(q=params["q"], xs=-3.0, ys=2.0,
                                     sigma_s=2.0)

    obs_std = 0.01
    uq = inverse.posterior_covariance(
        md, make_problem, {"q": jnp.asarray(1.7)}, snapshot_indices=idx,
        sensor_indices=sens, obs_std=obs_std)
    g = np.asarray(inverse.solve_snapshots(
        make_problem({"q": jnp.asarray(1.0)}), md,
        indices=idx)[..., jnp.asarray(sens)]).reshape(-1)
    exact = obs_std / np.linalg.norm(g)
    assert abs(uq["std"]["q"] - exact) / exact < 1e-6

    # Monte-Carlo sampling distribution of the closed-form LS estimator
    # q_hat = g.y/g.g over noisy replicas has std exactly obs_std/||g||.
    rng = np.random.default_rng(1)
    q_hats = [
        g @ (1.7 * g + obs_std * rng.standard_normal(g.size)) / (g @ g)
        for _ in range(200)
    ]
    mc_std = np.std(q_hats, ddof=1)
    assert abs(mc_std - uq["std"]["q"]) / uq["std"]["q"] < 0.25, (
        mc_std, uq["std"]["q"])


def test_posterior_covariance_labels_and_residual_sigma():
    """Flattened labels follow ravel_pytree order (vector leaves get
    index suffixes); obs_std=None estimates sigma from the residuals."""
    from airpollution_tpu.problems import GaussianSourceProblem

    md = _mesh(ms=6, nt=6)
    idx = [2, 5]

    def make_problem(params):
        return GaussianSourceProblem(
            q=jnp.exp(params["log_q"]), xs=params["xy"][0],
            ys=params["xy"][1], sigma_s=2.0)

    params = {"log_q": jnp.asarray(0.3),
              "xy": jnp.asarray([-2.0, 1.0])}
    truth = inverse.solve_snapshots(make_problem(params), md, indices=idx)
    rng = np.random.default_rng(2)
    obs = np.asarray(truth) + 0.005 * rng.standard_normal(truth.shape)
    uq = inverse.posterior_covariance(md, make_problem, params,
                                      snapshot_indices=idx, observed=obs)
    assert uq["labels"] == ["log_q", "xy[0]", "xy[1]"]
    assert uq["cov"].shape == (3, 3)
    assert 0.002 < uq["obs_std"] < 0.02
    corr = np.asarray(uq["corr"])
    np.testing.assert_allclose(np.diag(corr), 1.0, rtol=1e-9)
    assert (np.abs(corr) <= 1.0 + 1e-9).all()
    with pytest.raises(ValueError, match="obs_std"):
        inverse.posterior_covariance(md, make_problem, params,
                                     snapshot_indices=idx)
