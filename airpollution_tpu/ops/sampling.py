"""Latin-Hypercube collocation sampling, pure JAX (pyDOE replacement).

The reference samples collocation points with pyDOE's ``lhs`` on the host
every epoch and ships them to the device (pinn.py:12, :472-528) — a
host<->device ping-pong per training step (SURVEY.md section 3.2). Here LHS
is generated on-device from a PRNG key (stratified permutation + jitter per
axis), so sampling fuses into the jitted training step and epochs run
entirely on the TPU.

Layout contracts mirrored from the reference:
- 3D interior sampling assigns LHS column 0 to t, 1 to x, 2 to y
  (pinn.py:486-489) but returns points as [x, y, t]; statistically
  irrelevant for random LHS, mirrored anyway for like-for-like behavior.
- Boundary sampling places n // 4 points per side in the order left, right,
  bottom, top, with LHS-sampled per-side coordinates and LHS times
  truncated to 4 * (n // 4) entries (pinn.py:492-528).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lhs_unit(key: jax.Array, n: int, dims: int, dtype=jnp.float32) -> jax.Array:
    """Latin-Hypercube sample of shape (n, dims) on [0, 1)^dims.

    Per axis: a random permutation of the n strata plus uniform jitter
    within each stratum — the same stratification property pyDOE's
    ``lhs(dims, n)`` provides.
    """
    k_perm, k_jit = jax.random.split(key)
    perm_keys = jax.random.split(k_perm, dims)
    perms = jnp.stack(
        [jax.random.permutation(k, n) for k in perm_keys], axis=1
    ).astype(dtype)
    jitter = jax.random.uniform(k_jit, (n, dims), dtype=dtype)
    return (perms + jitter) / n


def lhs_sampling(key, n_samples, xy_ranges, time_range=None, dtype=jnp.float32):
    """Sample (n, 2) space points or (n, 3) space-time points [x, y, t].

    Counterpart of ``lhs_sampling`` (pinn.py:472-490): ``xy_ranges`` is
    (x_min, x_max, y_min, y_max); with ``time_range`` the LHS column order
    is (t, x, y) per the reference quirk at pinn.py:486-489.
    """
    x_min, x_max, y_min, y_max = xy_ranges
    if time_range is None:
        u = lhs_unit(key, n_samples, 2, dtype)
        x = (x_max - x_min) * u[:, 0] + x_min
        y = (y_max - y_min) * u[:, 1] + y_min
        return jnp.stack([x, y], axis=1)
    t_min, t_max = time_range
    u = lhs_unit(key, n_samples, 3, dtype)
    t = (t_max - t_min) * u[:, 0] + t_min
    x = (x_max - x_min) * u[:, 1] + x_min
    y = (y_max - y_min) * u[:, 2] + y_min
    return jnp.stack([x, y, t], axis=1)


def sample_boundary_points(key, n_samples, xy_ranges, time_range,
                           dtype=jnp.float32):
    """Sample (4 * (n // 4), 3) points on the four box sides.

    Counterpart of ``sample_boundary_points`` (pinn.py:492-528): per-side
    LHS coordinates in order left (x = x_min), right, bottom (y = y_min),
    top; one shared LHS time column truncated to the total count.
    """
    x_min, x_max, y_min, y_max = xy_ranges
    t_min, t_max = time_range
    n_side = n_samples // 4

    k_t, k_l, k_r, k_b, k_tp = jax.random.split(key, 5)
    t_all = (t_max - t_min) * lhs_unit(k_t, n_samples, 1, dtype)[:, 0] + t_min
    t_all = t_all[: 4 * n_side]

    def side(k, lo, hi):
        return (hi - lo) * lhs_unit(k, n_side, 1, dtype)[:, 0] + lo

    y_left = side(k_l, y_min, y_max)
    y_right = side(k_r, y_min, y_max)
    x_bottom = side(k_b, x_min, x_max)
    x_top = side(k_tp, x_min, x_max)

    x = jnp.concatenate(
        [
            jnp.full((n_side,), x_min, dtype),
            jnp.full((n_side,), x_max, dtype),
            x_bottom,
            x_top,
        ]
    )
    y = jnp.concatenate(
        [
            y_left,
            y_right,
            jnp.full((n_side,), y_min, dtype),
            jnp.full((n_side,), y_max, dtype),
        ]
    )
    return jnp.stack([x, y, t_all], axis=1)


def sample_facade_points(key, n_samples, obstacles, time_range,
                         dtype=jnp.float32):
    """Collocation points on obstacle FACADES with outward normals.

    ``obstacles`` is the static rectangle tuple
    (problems.AdDifProblem.obstacles): for each (xmin, xmax, ymin, ymax)
    block the four wall segments are sampled with stratified positions
    (points allocated proportionally to wall length, >= 1 per wall) and
    LHS times. Returns ``(xyt, normals)``: (n', 3) points and (n', 2)
    unit normals pointing OUT of the solid (into the fluid) — the
    direction the PINN's no-flux facade residual ``dc/dn = 0``
    differentiates along (the continuum limit of the FEM's masked
    assembly: the dropped solid triangles leave zero DIFFUSIVE flux on
    the cut, models/crbe.obstacle_masks). n' may differ slightly from
    ``n_samples`` (per-wall rounding); it is static.
    """
    sides = []  # (x0, y0, dx, dy, length, nx, ny)
    for (x0, x1, y0, y1) in obstacles:
        w, h = float(x1 - x0), float(y1 - y0)
        sides += [
            (x0, y0, w, 0.0, w, 0.0, -1.0),   # bottom wall, normal -y
            (x0, y1, w, 0.0, w, 0.0, 1.0),    # top wall, normal +y
            (x0, y0, 0.0, h, h, -1.0, 0.0),   # left wall, normal -x
            (x1, y0, 0.0, h, h, 1.0, 0.0),    # right wall, normal +x
        ]
    perimeter = sum(s[4] for s in sides)
    counts = [max(1, int(round(n_samples * s[4] / perimeter)))
              for s in sides]
    n_total = sum(counts)
    keys = jax.random.split(key, len(sides) + 1)
    pts, nrm = [], []
    for (x0, y0, dx, dy, _, nx, ny), c, k in zip(sides, counts, keys):
        # Stratified positions along the wall (one point per stratum).
        u = (jnp.arange(c, dtype=dtype)
             + jax.random.uniform(k, (c,), dtype)) / c
        pts.append(jnp.stack([x0 + u * dx, y0 + u * dy], axis=1))
        nrm.append(jnp.broadcast_to(jnp.asarray([nx, ny], dtype),
                                    (c, 2)))
    t0, t1 = time_range
    t = t0 + (t1 - t0) * lhs_unit(keys[-1], n_total, 1, dtype)[:, 0]
    xyt = jnp.concatenate(
        [jnp.concatenate(pts, axis=0), t[:, None]], axis=1
    )
    return xyt, jnp.concatenate(nrm, axis=0)
