"""Ensemble forecasting under parameter uncertainty.

Operational air-quality forecasts are run as ENSEMBLES: the wind and
eddy-diffusivity driving the transport are uncertain, so the model is
integrated for a population of perturbed parameter sets and the products
are the ensemble mean/spread and exceedance probabilities
P(c(x, T) > threshold) — the regulatory quantity behind air-quality
alerts. The reference has no counterpart (one deterministic solve,
crbe.py:406-433); its closest relative is the sequential D-sensitivity
loop (sensitivity_analysis.py:91-115).

TPU-first construction: every member's full implicit solve is ONE
``vmap`` over the stacked problem pytrees (assembly included — D and v
are traced leaves, so the member axis rides through ``segment_sum`` and
the Krylov scan exactly as in parallel/sweep.py), compiled once; with a
device mesh the member axis is ``shard_map``-ed over 'trial' so each
chip integrates a slice of the ensemble. Statistics are computed
on-device from the stacked member fields.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from airpollution_tpu.models.crbe import assemble, reject_robin, run_time_loop

__all__ = ["stack_problems", "ensemble_forecast", "enkf_update",
           "place_sensors"]


def stack_problems(problems):
    """Stack same-structure problem pytrees along a new member axis.

    All members must share the pytree structure (same class and static
    configuration — e.g. identical ``robin_sides``); the physical leaves
    (v, D, sigma, reaction, source parameters, ...) become (K, ...)
    arrays. Returns the batched pytree vmappable over axis 0.
    """
    if not problems:
        raise ValueError("empty ensemble")
    t0 = jax.tree_util.tree_structure(problems[0])
    for p in problems[1:]:
        if jax.tree_util.tree_structure(p) != t0:
            raise ValueError(
                "ensemble members must share a problem class and static "
                f"configuration: {jax.tree_util.tree_structure(p)} != {t0}"
            )
    return jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *problems
    )


# Jitted forecast programs, keyed per (mesh, options, device-mesh) —
# see the cache note inside ensemble_forecast. Bounded like
# inverse._FIT_STEP_CACHE (id(mesh_data) keys would otherwise pin dead
# meshes forever).
_FORECAST_FN_CACHE: dict = {}
_FORECAST_FN_CACHE_MAX = 8


@jax.jit
def _ensemble_stats_plain(m):
    return {
        "members": m,
        "mean": m.mean(axis=0),
        "std": m.std(axis=0, ddof=1) if m.shape[0] > 1
        else jnp.zeros_like(m[0]),
    }


@jax.jit
def _ensemble_stats(m, taus):
    out = _ensemble_stats_plain(m)
    out["exceedance"] = (m[None, :, :] > taus[:, None, None]).mean(axis=1)
    return out


def ensemble_forecast(mesh_data, domain, problems, *, order=1, tol=1e-7,
                      maxiter=200, stiffness_convention="correct",
                      source_quadrature="mass_lumped", thresholds=(),
                      mesh: Mesh | None = None, axis: str = "trial",
                      u0_members=None, t0=0.0):
    """Integrate every ensemble member to t=T and return forecast products.

    ``problems`` is a sequence of problem instances of one class whose
    traced leaves differ (perturbed v/D/sources...). Returns a dict of
    device arrays:

    - ``members``: (K, n_seg) final-time fields (boundary-lifted,
      run_time_loop ``store_solutions=False`` semantics),
    - ``mean``, ``std``: ensemble mean and spread (ddof=1 for K > 1),
    - ``exceedance``: (len(thresholds), n_seg) member fractions with
      c(x, T) > threshold — the alert-probability map.

    With ``mesh`` given, members are sharded over the ``axis`` device
    axis (padded by repeating the last member, sliced off afterwards).

    ``u0_members`` restarts the ensemble from GIVEN per-member states —
    a (K, n_seg) array replacing each member's ``initial_condition_fn``.
    Together with the window start time ``t0`` (offsetting source/BC
    evaluation inside the window, run_time_loop's t0) this makes the
    forecast RESTARTABLE, which is what a cycling forecast–analysis
    system needs: forecast one window, analyze with
    :func:`enkf_update`, forecast the next window from the analysis
    ensemble (scripts/da_cycling_demo.py). Both are traced arguments of
    the one cached program — cycles never recompile.
    """
    md = mesh_data
    for p in problems:
        reject_robin(p, "ensemble_forecast (vmapped assembly)")
    dt = domain.T / (md.nt - 1)
    n_members = len(problems)
    batched = stack_problems(problems)
    if u0_members is None:
        u0_batch = jax.vmap(
            lambda p: jnp.asarray(
                p.initial_condition_fn(md.midpoints), md.midpoints.dtype
            )
        )(batched)
    else:
        u0_batch = jnp.asarray(u0_members, md.midpoints.dtype)
        if u0_batch.shape != (n_members, md.number_of_segments):
            raise ValueError(
                f"u0_members {u0_batch.shape} must be "
                f"({n_members}, {md.number_of_segments})"
            )
    t0 = jnp.asarray(t0, md.midpoints.dtype)

    # One jitted program per (mesh, options, device-mesh) — NOT per call:
    # the assimilation cycle (forecast -> enkf_update -> forecast) would
    # otherwise retrace+recompile the full vmapped scan every cycle
    # (~minutes per compile on the remote TPU tunnel). Follows the
    # module-cache convention of inverse._fit_cache_get / the PINN
    # trainer cache; jit itself handles new member counts / problem
    # treedefs within one cached callable.
    key = (id(md), float(dt), int(order), float(tol), int(maxiter),
           stiffness_convention, source_quadrature,
           None if mesh is None else (id(mesh), axis))
    solve_batch = _FORECAST_FN_CACHE.get(key)
    if solve_batch is None:

        def solve_one(problem, u0, t_start):
            ops = assemble(md, problem, dt, order, stiffness_convention)
            sols, _ = run_time_loop(
                ops, u0, mesh_data=md, problem=problem, dt=dt,
                order=order, tol=tol, maxiter=maxiter,
                store_solutions=False,
                source_quadrature=source_quadrature, t0=t_start,
            )
            return sols[0]

        vmapped = jax.vmap(solve_one, in_axes=(0, 0, None))
        if mesh is None:
            solve_batch = jax.jit(vmapped)
        else:
            sharded = jax.shard_map(
                vmapped, mesh=mesh,
                in_specs=(P(axis), P(axis), P()), out_specs=P(axis),
                check_vma=False,
            )
            # Replicate on the way out: slicing off the padding members
            # of a trial-sharded array is ambiguous, and the statistics
            # reduce over the member axis anyway.
            solve_batch = jax.jit(
                sharded,
                out_shardings=jax.NamedSharding(mesh, P()),
            )
        _FORECAST_FN_CACHE[key] = solve_batch
        while len(_FORECAST_FN_CACHE) > _FORECAST_FN_CACHE_MAX:
            _FORECAST_FN_CACHE.pop(next(iter(_FORECAST_FN_CACHE)))

    if mesh is not None:
        n_dev = mesh.shape[axis]
        n_pad = (-n_members) % n_dev
        if n_pad:
            pad = lambda a: jnp.concatenate(  # noqa: E731
                [a, jnp.repeat(a[-1:], n_pad, axis=0)]
            )
            batched = jax.tree.map(pad, batched)
            u0_batch = pad(u0_batch)
    members = solve_batch(batched, u0_batch, t0)[:n_members]

    taus = jnp.asarray(list(thresholds), members.dtype)
    out = dict(_ensemble_stats(members, taus)) if taus.size \
        else dict(_ensemble_stats_plain(members))
    return out


@jax.jit
def _enkf_update(members, y, sensors, obs_std, eps, inflation):
    X = members                                   # (K, n) forecast
    K_ens = X.shape[0]
    # Multiplicative prior inflation: scale anomalies about the mean
    # before the analysis. Cycling filters are systematically
    # UNDERDISPERSIVE (sampling error + model error both shrink the
    # ensemble spread faster than the true uncertainty), which starves
    # the gain and eventually makes the filter reject observations
    # entirely — the standard remedy (Anderson & Anderson 1999).
    X = X.mean(axis=0) + inflation * (X - X.mean(axis=0))
    S = X[:, sensors]                             # (K, m) at stations
    A = X - X.mean(axis=0)                        # (K, n) anomalies
    As = S - S.mean(axis=0)                       # (K, m)
    # Sample covariances never materialize at (n, n): the gain is built
    # from (n, m) and (m, m) matmuls — MXU work, K and m are small.
    C = (As.T @ As) / (K_ens - 1)                 # (m, m) = H P H^T
    C = C + (obs_std ** 2) * jnp.eye(C.shape[0], dtype=X.dtype)
    PHt = (A.T @ As) / (K_ens - 1)                # (n, m) = P H^T
    innov = (y[None, :] + eps) - S                # (K, m) perturbed-obs
    # x_a = x_f + P H^T C^{-1} innov, solved not inverted.
    return X + innov @ jnp.linalg.solve(C, PHt.T)


def enkf_update(members, observations, sensor_indices, obs_std, key,
                inflation: float = 1.0):
    """Stochastic ensemble-Kalman analysis step (perturbed observations).

    ``members`` is the (K, n_seg) forecast ensemble (e.g.
    ``ensemble_forecast(...)["members"]``), ``observations`` the (m,)
    station readings at ``sensor_indices``, ``obs_std`` the observation
    noise level (R = obs_std^2 I). Each member is nudged toward its own
    noise-perturbed copy of the observations through the Kalman gain
    built from the ensemble sample covariance (Evensen 1994/Burgers et
    al. 1998) — the analysis ensemble's sample statistics are consistent
    with the Kalman posterior. The covariance never materializes at
    (n, n): the gain is (n, m) x (m, m) matmuls with small m, K.

    ``inflation`` scales the forecast anomalies about the ensemble mean
    before the analysis (multiplicative prior inflation, Anderson &
    Anderson 1999) — use ~1.05–1.2 in CYCLING forecast–analysis loops
    (scripts/da_cycling_demo.py), where uninflated ensembles go
    underdispersive and the filter diverges; the default 1.0 is the
    plain single-analysis update.

    No localization is applied — appropriate for the moderate state
    sizes of 2D forecasting; at K << n with dense networks consider
    thinning the sensor set. Returns the (K, n_seg) analysis ensemble.
    """
    X = jnp.asarray(members)
    y = jnp.asarray(observations, X.dtype)
    sensors = jnp.asarray([int(i) for i in sensor_indices])
    if y.shape != (sensors.shape[0],):
        raise ValueError(
            f"observations {y.shape} must match sensor_indices "
            f"({sensors.shape[0]},)"
        )
    if X.shape[0] < 2:
        raise ValueError("EnKF needs at least 2 ensemble members")
    eps = obs_std * jax.random.normal(
        key, (X.shape[0], sensors.shape[0]), X.dtype
    )
    return _enkf_update(X, y, sensors, jnp.asarray(obs_std, X.dtype), eps,
                        jnp.asarray(inflation, X.dtype))


@jax.jit
def _placement_step(A, mask, obs_var):
    """One greedy EnSRF placement step on the (K, n) anomaly matrix.

    Score of candidate c = expected TOTAL analysis-variance reduction
    from observing c:  trace(P) - trace(P_a) = ||P[:, c]||^2 / (var_c +
    obs_var)  — computed for every candidate at once as
    colsum(A * (G @ A)) with the (K, K) Gram matrix G = A A^T (never an
    (n, n) covariance). The winner is folded in with the deterministic
    square-root (Whitaker & Hamill 2002) rank-one anomaly update, so
    later picks see exactly the posterior ensemble a serial EnSRF would
    hold after assimilating the earlier stations.
    """
    K = A.shape[0]
    G = A @ A.T                                      # (K, K)
    var = (A * A).sum(axis=0) / (K - 1)              # (n,)
    red = (A * (G @ A)).sum(axis=0) / ((K - 1) ** 2)  # ||P[:, c]||^2
    score = jnp.where(mask, red / (var + obs_var), -jnp.inf)
    s = jnp.argmax(score)
    a = A[:, s]                                      # (K,)
    var_s = var[s]
    alpha = 1.0 / (1.0 + jnp.sqrt(obs_var / (var_s + obs_var)))
    A = A - (alpha / ((K - 1) * (var_s + obs_var))) * jnp.outer(a, a @ A)
    return A, mask.at[s].set(False), s, score[s]


def place_sensors(members, n_sensors, obs_std, candidate_indices=None):
    """Ensemble-based monitoring-network design: greedily site stations
    where observing the forecast ensemble buys the most analysis skill.

    ``members`` is a (K, n_seg) forecast ensemble (e.g.
    ``ensemble_forecast(...)["members"]`` — or a stack of climatological
    states). Each greedy step selects the candidate DOF with the largest
    expected total analysis-variance reduction under a scalar Kalman
    update with noise ``obs_std`` (R = obs_std^2 per station), then
    applies the deterministic square-root rank-one anomaly update
    (EnSRF, Whitaker & Hamill 2002) so subsequent picks account for
    what the network already knows — the standard targeted-observation
    construction. A station in the middle of a tight cluster of an
    already-observed plume lobe scores near zero after the first pick;
    the greedy set spreads along the ensemble's independent degrees of
    freedom instead of piling onto the variance maximum.

    ``candidate_indices`` restricts the search (siting constraints —
    e.g. land-only, existing-infrastructure DOFs). Returns
    ``(indices, reductions)``: the ordered station DOFs and each step's
    expected variance reduction (a diminishing-returns curve — read it
    to choose the network size). Selection never materializes an
    (n, n) covariance: each step is (K, K) and (K, n) matmuls.

    The reference has no observing-system machinery at all; this closes
    the loop with :func:`enkf_update` (use the returned indices as its
    ``sensor_indices``) and is EnKF-consistent by construction.
    """
    X = jnp.asarray(members)
    if X.ndim != 2 or X.shape[0] < 2:
        raise ValueError(
            f"members must be (K >= 2, n_seg), got {X.shape}"
        )
    n = X.shape[1]
    if not 0 < int(n_sensors) <= n:
        raise ValueError(f"n_sensors={n_sensors} out of range (1..{n})")
    mask = jnp.zeros(n, bool)
    if candidate_indices is None:
        mask = jnp.ones(n, bool)
    else:
        idx = jnp.asarray([int(i) for i in candidate_indices])
        if int(n_sensors) > idx.shape[0]:
            raise ValueError(
                f"n_sensors={n_sensors} exceeds the "
                f"{idx.shape[0]} candidate sites"
            )
        mask = mask.at[idx].set(True)
    A = X - X.mean(axis=0)
    obs_var = jnp.asarray(obs_std, X.dtype) ** 2
    picks, reds = [], []
    for _ in range(int(n_sensors)):
        A, mask, s, r = _placement_step(A, mask, obs_var)
        picks.append(int(s))
        reds.append(float(r))
    return picks, reds
