"""Problem and domain definitions (layer L0).

TPU-native counterpart of the reference's ``utils/common.py``. The reference
keeps a dual numpy/torch backend dispatch (``backend(x)``, common.py:7-13) so a
single ``Problem`` instance can serve both the numpy FEM solver and the torch
PINN. Here everything is a single jax.numpy backend: every method accepts
numpy or JAX arrays and returns JAX arrays, is traceable under ``jit``/``vmap``
and differentiable, so the same object serves the FEM path, the PINN residual,
and vectorized parameter sweeps (``vmap`` over ``D``/``v``).

Parity contracts (all cite /root/reference):
- ``Problem.analytical_solution``: Gaussian plume
  ``exp(-((x - vx t)^2 + (y - vy t)^2) / (4 D t + sigma^2)) / (pi (4 D t + sigma^2))``
  (utils/common.py:47-50), defaults ``v=[1.0, 0.5], D=0.1, sigma=1.0``
  (utils/common.py:35).
- ``initial_condition_fn`` = analytical solution at t=0 (utils/common.py:52-65).
- ``boundary_fn`` = analytical solution (utils/common.py:67-70).
- ``source_term`` = 0 (utils/common.py:72-76).
- ``Domain``: box [-Lx, Lx] x [-Ly, Ly], horizon T, defaults (20, 20, 10)
  (utils/common.py:81); ``is_boundary`` uses isclose with atol=1e-10
  (utils/common.py:87-97).
"""

from __future__ import annotations

import abc
import dataclasses

import jax
import jax.numpy as jnp


def _register_problem_pytree(cls, fields):
    """Register a problem class as a pytree with the given leaf fields.

    Physical parameters become traced leaves, so one compiled program
    serves every parameter value: the sensitivity sweep vmaps over traced
    ``D`` (parallel/sweep.py) and the PINN trainer cache is shared across
    problem instances (models/pinn.py)."""

    def flatten(p):
        # robin_sides / obstacles are STATIC configuration (masks and
        # assembly geometry are baked into the compiled program, not
        # traced), carried as hashable aux data so instances configured
        # via attribute assignment survive tree round-trips (jit
        # argument passing, vmap, checkpointing).
        rb = getattr(p, "robin_sides", None)
        rb_aux = None if rb is None else tuple(sorted(rb.items()))
        ob = getattr(p, "obstacles", None)
        ob_aux = None if ob is None else tuple(tuple(r) for r in ob)
        aux = (rb_aux, ob_aux)
        return tuple(getattr(p, f) for f in fields), aux

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for f, c in zip(fields, children):
            setattr(obj, f, c)
        rb_aux, ob_aux = aux
        if rb_aux is not None:
            obj.robin_sides = dict(rb_aux)
        if ob_aux is not None:
            obj.obstacles = ob_aux
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


# Public alias: USER problem subclasses (e.g. overriding robin_g or the
# source) must register themselves to be passed as traced arguments to
# the jitted trainers/sweeps — registration does not extend to
# subclasses. Closure-captured problems (CRBESolver) need no
# registration.
register_problem_pytree = _register_problem_pytree


# Outward unit normals of the box sides, keyed by the side names a
# ``robin_sides`` spec may use (AdDifProblem.robin_sides).
SIDE_NORMALS = {
    "left": (-1.0, 0.0),
    "right": (1.0, 0.0),
    "bottom": (0.0, -1.0),
    "top": (0.0, 1.0),
}


def robin_g_customized(problem) -> bool:
    """True when the problem's Robin inhomogeneity is not identically 0
    — i.e. it overrides ``robin_g`` or the elementwise ``robin_g_xy``,
    as a subclass method OR an instance attribute (``p.robin_g =
    partial(exact_robin_g, p)`` is the documented MMS shortcut, and an
    instance assignment slipping past this gate would make the g = 0
    fast paths silently solve different physics than the scan paths)."""
    t = type(problem)
    return ("robin_g" in vars(problem) or "robin_g_xy" in vars(problem)
            or t.robin_g is not AdDifProblem.robin_g
            or t.robin_g_xy is not AdDifProblem.robin_g_xy)


def robin_g_xy_provided(problem) -> bool:
    """True when the problem supplies the ELEMENTWISE inhomogeneity hook
    (method override or instance attribute) that the fused kernels can
    evaluate on iota-rebuilt wall lines."""
    return ("robin_g_xy" in vars(problem)
            or type(problem).robin_g_xy is not AdDifProblem.robin_g_xy)


def exact_robin_g(problem, xy, t, side):
    """Manufactured Robin data from a problem's analytical solution.

    Returns ``g = alpha c_ex + D dc_ex/dn`` on the given side, so that the
    exact solution satisfies the Robin law ``-D dc/dn = alpha c - g``
    exactly — the manufactured-solution route for verifying Robin solves
    against problems that carry a closed form (the normal derivative is
    obtained by autodiff of ``analytical_solution``). Assign as the
    problem's ``robin_g`` (e.g. ``p.robin_g = partial(exact_robin_g, p)``
    via a subclass override) to run an MMS convergence study.
    """
    xy = jnp.asarray(xy)
    alpha = problem.robin_sides[side]
    nx, ny = SIDE_NORMALS[side]
    # t: scalar (the FEM loop passes one step time) or per-point (N,)
    # (the PINN boundary loss passes each collocation point's own t).
    ts = jnp.broadcast_to(jnp.asarray(t, dtype=xy.dtype), (xy.shape[0],))

    def c_of_xy(p, ti):
        xyt = jnp.concatenate([p, ti[None]])[None, :]
        return problem.analytical_solution(xyt)[0]

    c = problem.analytical_solution(
        jnp.concatenate([xy, ts[:, None]], axis=1)
    )
    grad = jax.vmap(jax.grad(c_of_xy))(xy, ts)
    dcdn = nx * grad[:, 0] + ny * grad[:, 1]
    return alpha * c + problem.D * dcdn


class AdDifProblem(abc.ABC):
    """Abstract 2D advection-diffusion(-reaction) problem.

    Counterpart of ``AdDifProblem`` (utils/common.py:15-30). Subclasses define
    the initial condition, boundary values and source term; the velocity ``v``
    and diffusion coefficient ``D`` live on the instance so solvers can read
    them directly. ``v`` and ``D`` may be Python scalars or JAX scalars (the
    latter makes problems vmappable over physical parameters).

    ``reaction`` (beyond the reference, which models pure transport) is a
    first-order decay/deposition rate r >= 0 adding ``+ r c`` to the PDE —
    the standard linear-chemistry term of operational air-quality models.
    It enters the FEM operator as ``r M`` folded into ``K + A`` at assembly
    (models/crbe.assemble), so every solve path — scan, stencil, uniform,
    patch, fused Pallas, distributed — and the solver adjoint inherit it
    with zero per-step cost; the PINN residual adds ``reaction * c``
    (ops/autodiff.pde_residual).
    """

    # True when source_term is identically zero — unlocks fused solver
    # kernels that skip source evaluation (ops/pallas_solver.py).
    zero_source = False

    # True when source_term does not depend on t — the fused Pallas
    # kernels then evaluate the source load ONCE and reuse it every step
    # (ops/pallas_solver.py / ops/pallas_hbm.py).
    steady_source = False

    # True when v or D vary in space (beyond the reference's constant
    # transport). The FEM assembly then evaluates velocity_at /
    # diffusion_at per element (models/crbe.assemble) and the PINN
    # residual per collocation point; the translation-invariant fast
    # paths (uniform operator, patch assembly, uniform fused kernels)
    # reject such problems — the general stencil/canvas paths carry
    # per-DOF coefficients and remain exact. A CLASS attribute so it
    # stays static under jit tracing of problem pytrees.
    variable_coefficients = False

    # Boundary-condition specification beyond the reference's all-sides
    # Dirichlet (crbe.py:397-404): ``None`` keeps every boundary DOF
    # Dirichlet; a dict mapping side names ('left', 'right', 'bottom',
    # 'top') to Robin coefficients alpha imposes the flux law
    #
    #     -D dc/dn = alpha c - g        on the named sides,
    #
    # the natural boundary condition of the CR weak form. alpha = 0 is a
    # homogeneous Neumann (no-flux/reflecting) wall; alpha = v_d > 0 is
    # the standard dry-deposition condition of air-quality models
    # (deposition velocity v_d removes mass at rate v_d * c); ``g``
    # (:meth:`robin_g`, default 0) is the inhomogeneity, used e.g. for
    # manufactured-solution verification. Sides not named stay
    # Dirichlet. Because the CR basis function is identically 1 along
    # its own edge (phi_i = 1 - 2 lambda_i and lambda_i = 0 there) and
    # every other basis function integrates to zero along it, the
    # boundary integrals are DIAGONAL: the whole condition enters the
    # spatial operator as alpha * |e| on Robin-edge diagonal slots plus
    # a g * |e| load — see models/crbe.robin_terms. Static (not traced);
    # supported on the general ELL solve paths.
    robin_sides = None

    def robin_g(self, xy, t, side):
        """Robin inhomogeneity g(x, y, t) on the named side (see
        ``robin_sides``). Default 0 (pure deposition / no-flux walls);
        override for inhomogeneous flux data. ``side`` is a static
        string — per-side outward normals are in ``SIDE_NORMALS``.
        ``t`` is a scalar (FEM step time) or per-point (N,) array (PINN
        boundary collocation times).

        The default delegates to :meth:`robin_g_xy` (which returns 0),
        so a subclass can provide the inhomogeneity ONCE in elementwise
        form and have every path — scan, PINN, and the fused canvas
        stripe kernel — agree on it."""
        xy = jnp.asarray(xy)
        return self.robin_g_xy(xy[..., 0], xy[..., 1], t, side)

    def robin_g_xy(self, x, y, t, side):
        """Elementwise Robin inhomogeneity on separate coordinate arrays
        (broadcast), the :meth:`source_xy` analogue for the flux law.

        The fused canvas stripe kernel evaluates the g-load on wall
        coordinate lines rebuilt in-kernel from iotas, so it needs a
        form without the (..., 2) stacking of :meth:`robin_g`. Default
        0. Subclasses wanting inhomogeneous flux walls on the fused
        paths must override THIS hook (direct 2D arithmetic — stacking
        inside a Mosaic kernel forces a relayout); overriding only
        :meth:`robin_g` keeps the scan/PINN paths and leaves the fused
        kernels gated off."""
        x, y = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(y))
        return jnp.zeros_like(x)

    # True when v or D additionally vary in TIME. The hooks then take a
    # second argument t (``velocity_at(xy, t)`` etc.); solvers assemble
    # the operator per time chunk (models/unsteady.solve_time_varying —
    # the quasi-static approximation, standard for hourly wind fields)
    # and the PINN residual samples the hooks at each collocation
    # point's own t. Implies the variable_coefficients routing. A CLASS
    # attribute, static under jit.
    time_varying = False

    # Impermeable interior obstacles (buildings/terrain blocks) — beyond
    # the reference, which models an obstacle-free box. ``None`` (default)
    # keeps the full domain; a tuple of axis-aligned rectangles
    # ``((xmin, xmax, ymin, ymax), ...)`` carves solid blocks out of the
    # domain: triangles whose centroid falls inside any rectangle are
    # dropped from the FEM assembly (models/crbe.assemble masks their
    # local matrices), so the staircase cut boundary carries the weak
    # form's NATURAL boundary condition. For the ADVECTIVE-form weak
    # form this means: zero DIFFUSIVE flux through the wall, and the
    # solid never releases mass back (a perfect downwind shadow) —
    # but wind blowing INTO the wall deposits its advective flux there
    # (windward-facade impaction, an outflow-like wall), so total mass
    # decreases under such winds. For truly REFLECTING walls supply a
    # mass-consistent wind that vanishes at the obstacle
    # (variable_coefficients=True + velocity_at masking v near the
    # blocks — the standard diagnostic-wind-model practice); with
    # v.n = 0 at every wall the solve conserves mass (tested). DOFs
    # with no live triangle left become identity rows pinned to 0
    # (models/crbe.obstacle_masks).
    # Arbitrary shapes: override :meth:`obstacle_fn`. STATIC
    # configuration like ``robin_sides`` (the masks are baked into the
    # compiled program — obstacle geometry must not depend on traced
    # values); carried as pytree aux data. Supported on the per-DOF solve
    # paths (matvec_impl 'ell'/'stencil'/'pallas'/'auto'); the
    # translation-invariant fast paths (uniform operator, patch assembly,
    # fused kernels) refuse loudly.
    obstacles = None

    def obstacle_fn(self, xy):
        """Boolean "inside a solid obstacle" test at (..., 2) points.

        Default: union of the axis-aligned ``obstacles`` rectangles
        (closed on all sides). Override for arbitrary footprints; must be
        a pure function of coordinates and STATIC geometry only."""
        xy = jnp.asarray(xy)
        x, y = xy[..., 0], xy[..., 1]
        inside = jnp.zeros(xy.shape[:-1], dtype=bool)
        for (x0, x1, y0, y1) in self.obstacles or ():
            inside = inside | ((x >= x0) & (x <= x1)
                               & (y >= y0) & (y <= y1))
        return inside

    def __init__(self, v, D, reaction=0.0):
        self.v = v
        self.D = D
        self.reaction = reaction

    @abc.abstractmethod
    def initial_condition_fn(self, xy):
        """Initial condition c(x, y, 0) at points ``xy`` of shape (N, 2)."""

    @abc.abstractmethod
    def boundary_fn(self, xyt):
        """Dirichlet boundary values at space-time points ``xyt`` (N, 3)."""

    @abc.abstractmethod
    def source_term(self, xyt):
        """Source s(x, y, t) at space-time points ``xyt`` (N, 3)."""

    def source_xy(self, x, y, t):
        """Elementwise source on separate coordinate arrays (broadcast).

        The fused Pallas kernels evaluate the source on 2D coordinate
        canvases built in-kernel from iotas (zero extra HBM traffic), so
        they need an elementwise form that avoids the (..., 3) stacking
        of :meth:`source_term`. The default wraps ``source_term``;
        subclasses whose source is a simple formula should override it
        with direct 2D arithmetic (stacking to a 3D intermediate inside a
        Mosaic kernel forces a relayout).
        """
        x, y = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(y))
        xyt = jnp.stack([x, y, jnp.full_like(x, t)], axis=-1)
        return self.source_term(xyt)

    # --- spatially varying coefficient hooks (variable_coefficients) ---

    def velocity_at(self, xy, t=None):
        """Wind field v(x, y[, t]) at (N, 2) points -> (N, 2).

        Default: the constant ``v`` broadcast to every point. Override
        together with ``variable_coefficients = True`` for spatially
        varying winds; the FEM assembly samples it at triangle centroids
        (piecewise-constant per element, the standard first-order
        coefficient quadrature for CR elements). ``t`` is passed only
        for ``time_varying`` problems (a scalar at assembly, per-point
        times in the PINN residual)."""
        xy = jnp.asarray(xy)
        return jnp.broadcast_to(
            jnp.asarray(self.v, dtype=xy.dtype), xy.shape[:-1] + (2,)
        )

    def diffusion_at(self, xy, t=None):
        """Diffusion field D(x, y[, t]) at (N, 2) points -> (N,).

        Default: the constant ``D`` broadcast to every point."""
        xy = jnp.asarray(xy)
        return jnp.broadcast_to(
            jnp.asarray(self.D, dtype=xy.dtype), xy.shape[:-1]
        )

    def diffusion_grad_at(self, xy, t=None):
        """grad D(x, y) at (N, 2) points -> (N, 2).

        The PINN residual's non-conservative expansion of the diffusion
        term needs it: -div(D grad c) = -D lap c - grad D . grad c
        (ops/autodiff.pde_residual). The FEM weak form does NOT (it
        integrates D grad c . grad phi directly). Default: the generic
        autodiff of :meth:`diffusion_at` for variable-D problems and an
        exact zero for constant-D ones; override when a closed form is
        cheaper."""
        xy = jnp.asarray(xy)
        if not self.variable_coefficients:
            return jnp.zeros(xy.shape[:-1] + (2,), dtype=xy.dtype)

        if self.time_varying:
            def d_scalar(p, ti):
                return jnp.squeeze(self.diffusion_at(p[None, :], ti))

            t_flat = jnp.broadcast_to(
                jnp.asarray(t, xy.dtype), xy.shape[:-1]
            ).reshape(-1)
            return jax.vmap(jax.grad(d_scalar))(
                xy.reshape(-1, 2), t_flat
            ).reshape(xy.shape[:-1] + (2,))

        def d_scalar(p):
            return jnp.squeeze(self.diffusion_at(p[None, :]))

        return jax.vmap(jax.grad(d_scalar))(xy.reshape(-1, 2)).reshape(
            xy.shape[:-1] + (2,)
        )


class Problem(AdDifProblem):
    """Default Gaussian-plume problem with a closed-form solution.

    Counterpart of ``Problem`` (utils/common.py:32-76). The analytical
    solution doubles as initial and boundary data, which makes this problem
    the validation oracle for both solvers (SURVEY.md section 4).
    """

    zero_source = True  # common.py:72-76

    def __init__(self, v=(1.0, 0.5), D=0.1, sigma=1.0, reaction=0.0):
        super().__init__(jnp.asarray(v), D, reaction)
        self.sigma = sigma

    def analytical_solution(self, xyt):
        """Exact solution at (N, 3) space-time points [x, y, t].

        With a nonzero first-order ``reaction`` rate r the exact solution
        is the plume times ``exp(-r t)`` (the decay commutes with the
        constant-coefficient transport operator), so the problem remains
        its own validation oracle."""
        xyt = jnp.asarray(xyt)
        if xyt.shape[-1] != 3:
            raise ValueError("xyt must have 3 columns (x, y, t)")
        x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
        denom = 4.0 * self.D * t + self.sigma**2
        num = (x - self.v[0] * t) ** 2 + (y - self.v[1] * t) ** 2
        plume = jnp.exp(-num / denom) / (jnp.pi * denom)
        if isinstance(self.reaction, (int, float)) and self.reaction == 0.0:
            return plume  # parity path: bit-identical to common.py:47-50
        return plume * jnp.exp(-self.reaction * t)

    def initial_condition_fn(self, xy):
        xy = jnp.asarray(xy)
        if xy.shape[-1] != 2:
            raise ValueError("xy must have 2 columns (x, y)")
        t0 = jnp.zeros(xy.shape[:-1] + (1,), dtype=xy.dtype)
        return self.analytical_solution(jnp.concatenate([xy, t0], axis=-1))

    def boundary_fn(self, xyt):
        xyt = jnp.asarray(xyt)
        if xyt.shape[-1] != 3:
            raise ValueError("xyt must have 3 columns (x, y, t)")
        return self.analytical_solution(xyt)

    def source_term(self, xyt):
        xyt = jnp.asarray(xyt)
        if xyt.shape[-1] != 3:
            raise ValueError("xyt must have 3 columns (x, y, t)")
        return jnp.zeros_like(xyt[..., 0])


class ShiftedPlumeProblem(Problem):
    """Gaussian plume released at an arbitrary center (cx, cy).

    The reference's closed form (utils/common.py:47-50) translated:
    the plume tracks (cx + vx t, cy + vy t). Used as the operator-
    learning problem family (models/fno.py) — every member keeps an
    exact solution, so surrogate predictions can be scored against
    both the FEM field and the closed form. All parameters are traced
    pytree leaves (vmappable ensembles / datasets)."""

    def __init__(self, v=(1.0, 0.5), D=0.1, sigma=1.0, center=(0.0, 0.0),
                 reaction=0.0):
        super().__init__(v, D, sigma, reaction)
        self.cx = center[0]
        self.cy = center[1]

    def analytical_solution(self, xyt):
        xyt = jnp.asarray(xyt)
        if xyt.shape[-1] != 3:
            raise ValueError("xyt must have 3 columns (x, y, t)")
        x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
        denom = 4.0 * self.D * t + self.sigma**2
        num = ((x - self.cx - self.v[0] * t) ** 2
               + (y - self.cy - self.v[1] * t) ** 2)
        plume = jnp.exp(-num / denom) / (jnp.pi * denom)
        if isinstance(self.reaction, (int, float)) and self.reaction == 0.0:
            return plume
        return plume * jnp.exp(-self.reaction * t)


class SquarePulseProblem(AdDifProblem):
    """Square-pulse release problem ("Problem 3" case study).

    Counterpart of the case-study problem in scripts/problem3.py:30-46:
    c0 = 1 on [8, 12] x [8, 12], 0 elsewhere; zero Dirichlet boundary and zero
    source; defaults v=(1, 0), D=0.1 (scripts/problem3.py:31). It has no
    analytical solution, so the methods are validated against each other and
    against physics invariants (mass conservation, center-of-mass trajectory,
    spreading rate - see airpollution_tpu.diagnostics).
    """

    zero_source = True  # scripts/problem3.py:44-46

    def __init__(self, v=(1.0, 0.0), D=0.1, lo=8.0, hi=12.0, amplitude=1.0,
                 reaction=0.0):
        super().__init__(jnp.asarray(v), D, reaction)
        self.lo = lo
        self.hi = hi
        self.amplitude = amplitude

    def initial_condition_fn(self, xy):
        xy = jnp.asarray(xy)
        x, y = xy[..., 0], xy[..., 1]
        inside = (
            (x >= self.lo) & (x <= self.hi) & (y >= self.lo) & (y <= self.hi)
        )
        return jnp.where(inside, self.amplitude, 0.0).astype(xy.dtype)

    def boundary_fn(self, xyt):
        xyt = jnp.asarray(xyt)
        return jnp.zeros_like(xyt[..., 0])

    def source_term(self, xyt):
        xyt = jnp.asarray(xyt)
        return jnp.zeros_like(xyt[..., 0])


class GaussianSourceProblem(AdDifProblem):
    """Continuous Gaussian emission source (production scenario).

    An air-quality forward model the reference family does not include:
    zero initial concentration, zero Dirichlet boundary, and a steady
    point-like emission

        s(x, y, t) = q / (2 pi sigma_s^2)
                     * exp(-((x - xs)^2 + (y - ys)^2) / (2 sigma_s^2)),

    i.e. total emission rate ``q`` (mass/time) spread over a Gaussian
    footprint of width ``sigma_s`` centered at ``(xs, ys)``. All physical
    parameters — the rate ``q``, the location ``(xs, ys)``, ``v`` and
    ``D`` — are pytree leaves, so the whole solve is differentiable in
    them; ``diagnostics.inverse.fit_source`` recovers the source from
    sparse sensor observations through the solver adjoint. There is no
    analytical solution; the sourced RHS path is validated against a
    scipy step oracle (tests/test_fem.py) and by manufactured-solution
    convergence (tests/test_inverse.py).
    """

    zero_source = False
    steady_source = True  # t-independent: fused kernels hoist the load

    def __init__(self, v=(1.0, 0.5), D=0.1, q=1.0, xs=0.0, ys=0.0,
                 sigma_s=1.0, reaction=0.0):
        super().__init__(jnp.asarray(v), D, reaction)
        self.q = q
        self.xs = xs
        self.ys = ys
        self.sigma_s = sigma_s

    def initial_condition_fn(self, xy):
        xy = jnp.asarray(xy)
        if xy.shape[-1] != 2:
            raise ValueError("xy must have 2 columns (x, y)")
        return jnp.zeros(xy.shape[:-1], dtype=xy.dtype)

    def boundary_fn(self, xyt):
        xyt = jnp.asarray(xyt)
        return jnp.zeros_like(xyt[..., 0])

    def source_term(self, xyt):
        xyt = jnp.asarray(xyt)
        if xyt.shape[-1] != 3:
            raise ValueError("xyt must have 3 columns (x, y, t)")
        r2 = (xyt[..., 0] - self.xs) ** 2 + (xyt[..., 1] - self.ys) ** 2
        s2 = self.sigma_s**2
        return self.q * jnp.exp(-r2 / (2.0 * s2)) / (2.0 * jnp.pi * s2)

    def source_xy(self, x, y, t):
        # Direct 2D form for the fused Pallas kernels (no 3D stacking;
        # (1, n) x and (n, 1) y broadcast to the canvas inside).
        r2 = (x - self.xs) ** 2 + (y - self.ys) ** 2
        s2 = self.sigma_s**2
        return self.q * jnp.exp(-r2 / (2.0 * s2)) / (2.0 * jnp.pi * s2)


class RotatingPlumeProblem(AdDifProblem):
    """Gaussian puff in a solid-body-rotation wind field, with an exact
    closed-form solution — the validation oracle for the spatially
    varying coefficient machinery (beyond the reference's constant-wind
    family).

    The wind is the rigid rotation ``v(x, y) = omega * (-(y - cy),
    (x - cx))`` about the center ``(cx, cy)``. Because a rigid rotation
    commutes with the (rotation-invariant) Laplacian, the rotating-frame
    substitution ``xi = c + R(-omega t)(x - c)`` turns the PDE into pure
    diffusion: the exact solution is the standard diffusing Gaussian
    evaluated at the back-rotated point,

        c(x, t) = exp(-|xi - x0|^2 / (4 D t + sigma^2))
                  / (pi (4 D t + sigma^2)) * exp(-reaction t),

    where ``(x0, y0)`` is the initial puff center. Same closed-form
    family as utils/common.py:47-50 with the translation ``v t``
    replaced by the rotation.
    """

    zero_source = True
    variable_coefficients = True

    def __init__(self, omega=0.1, D=0.05, sigma=1.5, x0=5.0, y0=0.0,
                 cx=0.0, cy=0.0, reaction=0.0):
        # The constant-v slot is meaningless here: None makes any
        # ungated constant-coefficient consumer fail loudly instead of
        # silently using a wrong wind.
        super().__init__(None, D, reaction)
        self.omega = omega
        self.sigma = sigma
        self.x0 = x0
        self.y0 = y0
        self.cx = cx
        self.cy = cy

    def velocity_at(self, xy):
        xy = jnp.asarray(xy)
        x, y = xy[..., 0], xy[..., 1]
        return jnp.stack(
            [-self.omega * (y - self.cy), self.omega * (x - self.cx)],
            axis=-1,
        )

    def analytical_solution(self, xyt):
        xyt = jnp.asarray(xyt)
        if xyt.shape[-1] != 3:
            raise ValueError("xyt must have 3 columns (x, y, t)")
        x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
        # Back-rotate about the center: xi = c + R(-omega t) (x - c).
        th = -self.omega * t
        dx, dy = x - self.cx, y - self.cy
        xi = self.cx + jnp.cos(th) * dx - jnp.sin(th) * dy
        eta = self.cy + jnp.sin(th) * dx + jnp.cos(th) * dy
        denom = 4.0 * self.D * t + self.sigma**2
        num = (xi - self.x0) ** 2 + (eta - self.y0) ** 2
        plume = jnp.exp(-num / denom) / (jnp.pi * denom)
        if isinstance(self.reaction, (int, float)) and self.reaction == 0.0:
            return plume
        return plume * jnp.exp(-self.reaction * t)

    def initial_condition_fn(self, xy):
        xy = jnp.asarray(xy)
        if xy.shape[-1] != 2:
            raise ValueError("xy must have 2 columns (x, y)")
        t0 = jnp.zeros(xy.shape[:-1] + (1,), dtype=xy.dtype)
        return self.analytical_solution(jnp.concatenate([xy, t0], axis=-1))

    def boundary_fn(self, xyt):
        return self.analytical_solution(jnp.asarray(xyt))

    def source_term(self, xyt):
        xyt = jnp.asarray(xyt)
        return jnp.zeros_like(xyt[..., 0])


class AnisotropicPlumeProblem(AdDifProblem):
    """Gaussian plume with an anisotropic diffusion tensor
    ``D = diag(Dx, Dy)`` — the standard air-quality eddy-diffusivity
    model (horizontal mixing >> cross-wind mixing), beyond the
    reference's isotropic family (utils/common.py:32-76).

    The exact solution is the separable product of two 1D
    advection-diffusion kernels sharing the reference plume's initial
    condition (``exp(-r^2/sigma^2) / (pi sigma^2)`` at t=0):

        c = exp(-(x - vx t)^2 / sx - (y - vy t)^2 / sy)
            / (pi sqrt(sx sy)) * exp(-reaction t),
        sx = 4 Dx t + sigma^2,  sy = 4 Dy t + sigma^2.

    ``self.D`` holds the (2, 2) tensor: the FEM assembly integrates the
    full weak form ``grad phi . D grad phi`` (models/crbe.local_matrices)
    and the PINN residual contracts the Hessian with it
    (ops/autodiff.pde_residual) — a constant tensor keeps the operator
    translation-invariant, so every uniform-operator fast path (fused
    VMEM, HBM stripe, patch assembly, distributed solvers) applies
    unchanged. Full tensors with nonzero off-diagonals are equally
    supported by assembly/residual (validated by a manufactured
    solution); this built-in exposes the diagonal case because it has a
    closed form.
    """

    zero_source = True

    def __init__(self, v=(1.0, 0.5), Dx=0.1, Dy=0.01, sigma=1.0,
                 reaction=0.0):
        super().__init__(
            jnp.asarray(v),
            jnp.diag(jnp.stack([jnp.asarray(Dx, jnp.result_type(float)),
                                jnp.asarray(Dy, jnp.result_type(float))])),
            reaction,
        )
        self.Dx = Dx
        self.Dy = Dy
        self.sigma = sigma

    def analytical_solution(self, xyt):
        xyt = jnp.asarray(xyt)
        if xyt.shape[-1] != 3:
            raise ValueError("xyt must have 3 columns (x, y, t)")
        x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
        sx = 4.0 * self.Dx * t + self.sigma**2
        sy = 4.0 * self.Dy * t + self.sigma**2
        num_x = (x - self.v[0] * t) ** 2
        num_y = (y - self.v[1] * t) ** 2
        plume = jnp.exp(-num_x / sx - num_y / sy) / (
            jnp.pi * jnp.sqrt(sx * sy)
        )
        if isinstance(self.reaction, (int, float)) and self.reaction == 0.0:
            return plume
        return plume * jnp.exp(-self.reaction * t)

    def initial_condition_fn(self, xy):
        xy = jnp.asarray(xy)
        if xy.shape[-1] != 2:
            raise ValueError("xy must have 2 columns (x, y)")
        t0 = jnp.zeros(xy.shape[:-1] + (1,), dtype=xy.dtype)
        return self.analytical_solution(jnp.concatenate([xy, t0], axis=-1))

    def boundary_fn(self, xyt):
        return self.analytical_solution(jnp.asarray(xyt))

    def source_term(self, xyt):
        xyt = jnp.asarray(xyt)
        return jnp.zeros_like(xyt[..., 0])


class TurningWindProblem(AdDifProblem):
    """Gaussian puff in a wind that TURNS in time — spatially uniform
    ``v(t) = speed (cos(phi0 + omega_t t), sin(phi0 + omega_t t))``, the
    canonical diurnal/Ekman veering scenario and the oracle for the
    time-varying-coefficient machinery (models/unsteady).

    For a spatially constant (but time-dependent) wind the puff is
    rigidly advected along the integrated trajectory
    ``X(t) = integral_0^t v = (speed/omega_t) (sin(phi0 + omega_t t) -
    sin(phi0), cos(phi0) - cos(phi0 + omega_t t))`` while diffusing
    isotropically, so the exact solution is the reference plume form
    with ``v t`` replaced by ``X(t)``:

        c = exp(-|x - x0 - X(t)|^2 / (4 D t + sigma^2))
            / (pi (4 D t + sigma^2)) * exp(-reaction t).
    """

    zero_source = True
    variable_coefficients = True
    time_varying = True

    def __init__(self, speed=1.0, omega_t=0.5, phi0=0.0, D=0.1,
                 sigma=1.0, x0=0.0, y0=0.0, reaction=0.0):
        # The constant-v slot is meaningless (None -> any ungated
        # constant-coefficient consumer fails loudly).
        super().__init__(None, D, reaction)
        self.speed = speed
        self.omega_t = omega_t
        self.phi0 = phi0
        self.sigma = sigma
        self.x0 = x0
        self.y0 = y0

    def velocity_at(self, xy, t=None):
        xy = jnp.asarray(xy)
        t = jnp.asarray(0.0 if t is None else t, xy.dtype)
        phi = self.phi0 + self.omega_t * t
        vx = self.speed * jnp.cos(phi)
        vy = self.speed * jnp.sin(phi)
        shape = jnp.broadcast_shapes(xy.shape[:-1], jnp.shape(t))
        return jnp.stack([jnp.broadcast_to(vx, shape),
                          jnp.broadcast_to(vy, shape)], axis=-1)

    def _displacement(self, t):
        # X(t) = integral v dt, with the omega_t -> 0 limit handled (a
        # straight-line wind is the natural sanity configuration, and
        # omega_t may be a TRACED pytree leaf, so this must be a where,
        # not a Python branch; the safe denominator keeps the discarded
        # branch NaN-free).
        t = jnp.asarray(t)
        ph0, w = self.phi0, jnp.asarray(self.omega_t)
        safe_w = jnp.where(w == 0, 1.0, w)
        ph = ph0 + w * t
        Xc = (jnp.sin(ph) - jnp.sin(ph0)) * self.speed / safe_w
        Yc = (jnp.cos(ph0) - jnp.cos(ph)) * self.speed / safe_w
        X0 = self.speed * t * jnp.cos(ph0)
        Y0 = self.speed * t * jnp.sin(ph0)
        return (jnp.where(w == 0, X0, Xc), jnp.where(w == 0, Y0, Yc))

    def analytical_solution(self, xyt):
        xyt = jnp.asarray(xyt)
        if xyt.shape[-1] != 3:
            raise ValueError("xyt must have 3 columns (x, y, t)")
        x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
        Xt, Yt = self._displacement(t)
        denom = 4.0 * self.D * t + self.sigma**2
        num = (x - self.x0 - Xt) ** 2 + (y - self.y0 - Yt) ** 2
        plume = jnp.exp(-num / denom) / (jnp.pi * denom)
        if isinstance(self.reaction, (int, float)) and self.reaction == 0.0:
            return plume
        return plume * jnp.exp(-self.reaction * t)

    def initial_condition_fn(self, xy):
        xy = jnp.asarray(xy)
        t0 = jnp.zeros(xy.shape[:-1] + (1,), dtype=xy.dtype)
        return self.analytical_solution(jnp.concatenate([xy, t0], axis=-1))

    def boundary_fn(self, xyt):
        return self.analytical_solution(jnp.asarray(xyt))

    def source_term(self, xyt):
        xyt = jnp.asarray(xyt)
        return jnp.zeros_like(xyt[..., 0])


class MultiSpeciesProblem:
    """K coupled species over one transport field with linear chemistry:

        dt c_k + v_k . grad c_k - D_k lap c_k + sum_j R[k, j] c_j = s_k

    The off-diagonal coupling matrix ``R`` ((K, K), rows = target-species
    equations — a decay chain, scavenging, or a linearized NOx/O3-style
    mechanism) is what the single-species ``reaction`` scalar cannot
    express. This is a CONTAINER, not an :class:`AdDifProblem`: each
    wrapped per-species problem supplies IC/BC/source and the transport
    coefficients; their own ``reaction`` must be zero (all chemistry
    lives in ``R``). Solved by
    :class:`airpollution_tpu.models.multispecies.MultiSpeciesSolver`
    via Strang chemistry-transport splitting. Nothing in the reference
    supports more than one species (crbe.py:225-482 evolves exactly one
    scalar field).

    Closed-form oracle: when every species shares (v, D), the transport
    operator commutes with the chemistry matrix, so

        c(x, t) = expm(-R t) @ [phi_1(x, t), ..., phi_K(x, t)]

    with ``phi_j`` the UNCOUPLED transport solution of species j's
    problem — available whenever each wrapped problem carries an
    ``analytical_solution`` (e.g. Gaussian plumes with distinct centers).
    """

    def __init__(self, species, R):
        self.species = tuple(species)
        if len(self.species) < 1:
            raise ValueError("need at least one species problem")
        for k, p in enumerate(self.species):
            r = getattr(p, "reaction", 0.0)
            if not (isinstance(r, (int, float)) and r == 0.0):
                raise ValueError(
                    f"species {k} has reaction={r!r}; per-species decay "
                    "belongs on the diagonal of R (set reaction=0)"
                )
            if getattr(p, "time_varying", False) or getattr(
                    p, "variable_coefficients", False):
                raise ValueError(
                    "multi-species solves support constant-coefficient "
                    f"species problems only (species {k} is variable/"
                    "time-varying)"
                )
        K = len(self.species)
        self.R = jnp.asarray(R, dtype=jnp.result_type(float))
        if self.R.shape != (K, K):
            raise ValueError(
                f"R must be ({K}, {K}) for {K} species, got {self.R.shape}"
            )
        # Robin/deposition walls: deposition velocities are SPECIES
        # properties (O3 and NO2 deposit at different rates), so the
        # spec lives on the wrapped problems — but the Dirichlet/Robin
        # PARTITION must be common (the vmapped transport loop applies
        # one mask set across the (K, N) state). Alphas may differ;
        # differing alphas make the transport operators per-species
        # (see shared_transport).
        sides0 = frozenset(getattr(self.species[0], "robin_sides", None)
                           or ())
        for k, p in enumerate(self.species[1:], start=1):
            sides = frozenset(getattr(p, "robin_sides", None) or ())
            if sides != sides0:
                raise ValueError(
                    f"species {k} names Robin sides {sorted(sides)} but "
                    f"species 0 names {sorted(sides0)} — all species "
                    "must share the Dirichlet/Robin partition "
                    "(deposition velocities may differ)"
                )
        for k, p in enumerate(self.species):
            if (getattr(p, "robin_sides", None)
                    and robin_g_customized(p)):
                raise ValueError(
                    f"species {k} overrides robin_g/robin_g_xy — "
                    "multi-species Robin walls support the homogeneous "
                    "flux law only (deposition/no-flux; g = 0)"
                )
        # Solid obstacles are domain GEOMETRY — one carved domain for
        # the whole mechanism (the vmapped transport loop applies one
        # dead-DOF mask across the (K, N) state).
        obs0 = getattr(self.species[0], "obstacles", None) or None
        for k, p in enumerate(self.species[1:], start=1):
            if (getattr(p, "obstacles", None) or None) != obs0:
                raise ValueError(
                    f"species {k} declares different obstacles than "
                    "species 0 — obstacle geometry must be common to "
                    "every species"
                )

    @property
    def obstacles(self):
        """Common obstacle geometry (validated identical across species),
        surfaced so solver gates and obstacle_masks read the wrapper like
        a single-species problem."""
        return getattr(self.species[0], "obstacles", None)

    def obstacle_fn(self, xy):
        return self.species[0].obstacle_fn(xy)

    @property
    def n_species(self):
        return len(self.species)

    @property
    def zero_source(self):
        return all(getattr(p, "zero_source", False) for p in self.species)

    @property
    def shared_transport(self):
        """True when all species share (v, D) AND identical Robin specs
        — one assembled operator serves every species (deposition alphas
        enter the operator diagonal, so differing velocities make the
        operators per-species)."""
        import numpy as np

        p0 = self.species[0]
        rb0 = getattr(p0, "robin_sides", None)
        return all(
            np.allclose(np.asarray(p.v), np.asarray(p0.v))
            and np.allclose(np.asarray(p.D), np.asarray(p0.D))
            and getattr(p, "robin_sides", None) == rb0
            for p in self.species[1:]
        )

    @property
    def has_analytical(self):
        """True when the expm-mixture oracle applies (see class docstring)."""
        return self.shared_transport and all(
            hasattr(p, "analytical_solution") for p in self.species
        )

    # --- stacked per-species evaluations (K along axis 0) ---

    def initial_conditions(self, xy):
        """(K, N) initial concentrations at points ``xy`` of shape (N, 2)."""
        xy = jnp.asarray(xy)
        return jnp.stack([p.initial_condition_fn(xy) for p in self.species])

    def _xyt(self, xy, t):
        xy = jnp.asarray(xy)
        t_col = jnp.full(xy.shape[:-1] + (1,), t, dtype=xy.dtype)
        return jnp.concatenate([xy, t_col], axis=-1)

    def boundary_values(self, xy, t, R=None):
        """(K, N) Dirichlet values at scalar time ``t``.

        The coupled system's true boundary data is the chemistry mixture
        of the per-species transport boundary values — when the oracle
        applies this IS ``analytical_solution``; otherwise the wrapped
        problems' own ``boundary_fn`` values are stacked (exact for the
        homogeneous-BC problems of the reference family). ``R`` overrides
        the stored mechanism (traced chemistry-rate fitting,
        diagnostics/inverse.fit_chemistry)."""
        if self.has_analytical:
            return self.analytical_solution(xy, t, R=R)
        xyt = self._xyt(xy, t)
        return jnp.stack([p.boundary_fn(xyt) for p in self.species])

    def sources(self, xy, t):
        """(K, N) source terms at scalar time ``t``."""
        xyt = self._xyt(xy, t)
        return jnp.stack([p.source_term(xyt) for p in self.species])

    def analytical_solution(self, xy, t, R=None):
        """(K, N) exact coupled solution at scalar time ``t`` (oracle).

        ``expm(-R t)`` applied across the stack of uncoupled transport
        solutions; requires :attr:`has_analytical`. ``R`` overrides the
        stored mechanism (traced rate fitting)."""
        if not self.has_analytical:
            raise ValueError(
                "the expm-mixture oracle needs shared (v, D) and "
                "analytical per-species problems"
            )
        from jax.scipy.linalg import expm

        R = self.R if R is None else jnp.asarray(R, self.R.dtype)
        xyt = self._xyt(xy, t)
        phi = jnp.stack([p.analytical_solution(xyt) for p in self.species])
        E = expm(-jnp.asarray(t, R.dtype) * R)
        return jnp.einsum("kj,jn->kn", E.astype(phi.dtype), phi,
                          precision=jax.lax.Precision.HIGHEST)


_register_problem_pytree(Problem, ("v", "D", "sigma", "reaction"))
_register_problem_pytree(
    ShiftedPlumeProblem, ("v", "D", "sigma", "cx", "cy", "reaction")
)
_register_problem_pytree(
    TurningWindProblem,
    ("v", "D", "speed", "omega_t", "phi0", "sigma", "x0", "y0",
     "reaction"),
)
_register_problem_pytree(
    AnisotropicPlumeProblem,
    ("v", "D", "Dx", "Dy", "sigma", "reaction"),
)
_register_problem_pytree(
    SquarePulseProblem, ("v", "D", "lo", "hi", "amplitude", "reaction")
)
_register_problem_pytree(
    GaussianSourceProblem,
    ("v", "D", "q", "xs", "ys", "sigma_s", "reaction"),
)
_register_problem_pytree(
    RotatingPlumeProblem,
    ("v", "D", "omega", "sigma", "x0", "y0", "cx", "cy", "reaction"),
)


@dataclasses.dataclass(frozen=True)
class Domain:
    """Box domain [-Lx, Lx] x [-Ly, Ly] with time horizon [0, T].

    Counterpart of ``Domain`` (utils/common.py:78-97). Frozen dataclass so it
    can be closed over by jitted functions and used as part of static config.
    """

    Lx: float = 20.0
    Ly: float = 20.0
    T: float = 10.0

    def is_boundary(self, x):
        """Boolean mask of points lying on the box boundary.

        Matches the reference's isclose test with atol=1e-10
        (utils/common.py:92-97); any time column is ignored.
        """
        x = jnp.asarray(x)
        if x.shape[-1] < 2:
            raise ValueError("x must have at least 2 columns (x, y)")
        atol = 1e-10
        on_left = jnp.isclose(x[..., 0], -self.Lx, atol=atol, rtol=0.0)
        on_right = jnp.isclose(x[..., 0], self.Lx, atol=atol, rtol=0.0)
        on_bottom = jnp.isclose(x[..., 1], -self.Ly, atol=atol, rtol=0.0)
        on_top = jnp.isclose(x[..., 1], self.Ly, atol=atol, rtol=0.0)
        return on_left | on_right | on_bottom | on_top
