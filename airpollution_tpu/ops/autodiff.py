"""PDE-residual autodiff: gradients and Laplacians, forward-over-reverse.

TPU-native counterpart of the reference's double-backward torch.autograd
chain (pinn.py:442-469). Two differences by design:

1. The Laplacian here is *correct*. The reference slices batch rows instead
   of coordinate columns when forming second derivatives
   (``grad_c[d:d+1]`` at pinn.py:467 instead of ``grad_c[:, d:d+1]``), so
   the diffusion term it trains against is wrong for all but isolated rows
   (SURVEY.md defect D1). This module computes the true
   ``d2u/dx2 + d2u/dy2``.
2. Second derivatives use forward-over-reverse (``jax.jvp`` over
   ``jax.grad``): one reverse pass gives the gradient, and one JVP per
   spatial dimension extracts a Hessian column — the standard efficient
   scheme for PINN residuals (2 extra passes for a 2D Laplacian instead of
   a full Hessian).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def gradient_and_laplacian_xy(
    u_fn: Callable[[jax.Array], jax.Array], pts: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched first derivatives and spatial Laplacian of a scalar field.

    Args:
      u_fn: maps a single (3,) point [x, y, t] to a scalar.
      pts: (N, 3) batch of points.

    Returns:
      (grad_xy (N, 2), grad_t (N, 1), laplacian_xy (N, 1)) — the same
      triple as the reference's ``compute_gradient_and_laplacian_xy``
      (pinn.py:442-469), with the Laplacian computed correctly.
    """
    grad_fn = jax.grad(u_fn)

    def per_point(p):
        # One linearization of grad_fn serves both Hessian columns (two
        # separate jvp calls would redo the primal reverse pass). The
        # tangents derive from p (zeros_like) so their type matches the
        # primal under shard_map's varying-axis tracking.
        g, lin = jax.linearize(grad_fn, p)
        z = jnp.zeros_like(p)
        h0 = lin(z.at[0].set(1.0))  # H @ e_x
        h1 = lin(z.at[1].set(1.0))  # H @ e_y
        return g[:2], g[2:3], (h0[0] + h1[1])[None]

    grad_xy, grad_t, lap = jax.vmap(per_point)(pts)
    return grad_xy, grad_t, lap


def gradient_and_hessian_xy(
    u_fn: Callable[[jax.Array], jax.Array], pts: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Like :func:`gradient_and_laplacian_xy` but returning the full
    spatial Hessian (N, 2, 2) — same cost (the two Hessian columns the
    Laplacian needs already contain every entry); used for anisotropic
    diffusion tensors where the residual needs the cross term
    ``2 Dxy d2u/dxdy``."""
    grad_fn = jax.grad(u_fn)

    def per_point(p):
        g, lin = jax.linearize(grad_fn, p)
        z = jnp.zeros_like(p)
        h0 = lin(z.at[0].set(1.0))
        h1 = lin(z.at[1].set(1.0))
        hess = jnp.stack([h0[:2], h1[:2]])
        return g[:2], g[2:3], hess

    return jax.vmap(per_point)(pts)


def pde_residual(
    u_fn: Callable[[jax.Array], jax.Array],
    pts: jax.Array,
    v: jax.Array,
    D,
    source: jax.Array,
    *,
    reaction=0.0,
    D_grad=None,
) -> jax.Array:
    """Advection-diffusion(-reaction) residual
    ``dc/dt + v . grad c - div(D grad c) + r c - s`` at each point
    (pinn.py:131-146 semantics, correct Laplacian; the first-order decay
    rate ``reaction`` extends the reference's pure-transport residual —
    see problems.AdDifProblem). A statically zero ``reaction`` skips the
    extra forward pass entirely.

    Spatially varying coefficients (problems.AdDifProblem hooks): ``v``
    may be a per-point (N, 2) field and ``D`` a per-point (N,) field, in
    which case ``D_grad`` (N, 2) supplies grad D for the non-conservative
    expansion ``-div(D grad c) = -D lap c - grad D . grad c``; constant
    coefficients leave ``D_grad=None`` and the term vanishes.

    Anisotropic diffusion: a constant (2, 2) tensor ``D`` switches the
    diffusion term to the full Hessian contraction ``sum_ij D_ij
    d2u/dxi dxj`` (problems.AnisotropicPlumeProblem). Spatially varying
    TENSORS are FEM-only (the weak form needs no D derivatives; the
    strong-form residual here would) and raise."""
    tensor_D = jnp.ndim(D) == 2 and jnp.shape(D) == (2, 2)
    if jnp.ndim(D) == 3:
        raise NotImplementedError(
            "spatially varying diffusion TENSORS are supported by the "
            "FEM weak form only (the PINN strong-form residual would "
            "need div D, which the problem hooks do not supply)"
        )
    if tensor_D:
        grad_xy, grad_t, hess = gradient_and_hessian_xy(u_fn, pts)
        diff_term = jnp.einsum(
            "ij,nij->n", jnp.asarray(D, pts.dtype), hess
        ).reshape(-1, 1)
    else:
        grad_xy, grad_t, lap = gradient_and_laplacian_xy(u_fn, pts)
        D_col = D.reshape(-1, 1) if jnp.ndim(D) == 1 else D
        diff_term = D_col * lap
    v = jnp.asarray(v, dtype=pts.dtype)
    v2 = v[None, :2] if v.ndim == 1 else v[:, :2]
    v_dot_grad = jnp.sum(v2 * grad_xy, axis=1, keepdims=True)
    res = grad_t + v_dot_grad - diff_term - source.reshape(-1, 1)
    if D_grad is not None:
        res = res - jnp.sum(
            jnp.asarray(D_grad, dtype=pts.dtype) * grad_xy, axis=1,
            keepdims=True,
        )
    if not (isinstance(reaction, (int, float)) and reaction == 0.0):
        c = jax.vmap(u_fn)(pts).reshape(-1, 1)
        res = res + reaction * c
    return res


def problem_pde_residual(
    u_fn: Callable[[jax.Array], jax.Array],
    pts: jax.Array,
    problem,
    source: jax.Array,
    *,
    reaction=0.0,
) -> jax.Array:
    """:func:`pde_residual` with coefficients read from a problem.

    Dispatches statically on ``problem.variable_coefficients`` (a class
    attribute, so the branch is resolved at trace time): constant
    problems hit the original ``problem.v`` / ``problem.D`` path
    unchanged; variable ones evaluate the velocity/diffusion field hooks
    per collocation point. For variable problems whose ``diffusion_at``
    is actually constant, ``diffusion_grad_at`` autodiffs to symbolic
    zeros and XLA folds the extra term away."""
    if getattr(problem, "variable_coefficients", False):
        xy = pts[..., :2]
        # time_varying problems get each collocation point's own t (the
        # hooks broadcast it); steady fields keep the 1-arg call.
        targs = ((pts[..., 2],)
                 if getattr(problem, "time_varying", False) else ())
        D_at = problem.diffusion_at(xy, *targs)
        if jnp.ndim(D_at) >= 3:
            raise NotImplementedError(
                "spatially varying diffusion TENSORS are supported by "
                "the FEM weak form only (the PINN strong-form residual "
                "would need div D, which the problem hooks do not "
                "supply)"
            )
        return pde_residual(
            u_fn, pts, problem.velocity_at(xy, *targs), D_at,
            source, reaction=reaction,
            D_grad=problem.diffusion_grad_at(xy, *targs),
        )
    return pde_residual(u_fn, pts, problem.v, problem.D, source,
                        reaction=reaction)
