"""Anisotropic diffusion tensors (beyond the reference's scalar D).

``D`` may be a (2, 2) tensor (constant — problems.AnisotropicPlumeProblem,
closed-form oracle) or a per-triangle tensor field (FEM weak form only).
The CR weak form integrates ``grad phi . D grad phi`` exactly
(models/crbe.local_matrices); the PINN residual contracts the full
Hessian (ops/autodiff.pde_residual). A constant tensor keeps the
operator translation-invariant, so every uniform-operator fast path
applies unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver, local_matrices
from airpollution_tpu.ops import autodiff
from airpollution_tpu.problems import (
    AdDifProblem,
    AnisotropicPlumeProblem,
    Domain,
)


def _f64(x):
    return jnp.asarray(x, dtype=jnp.float64)


def test_diagonal_tensor_reduces_to_scalar():
    """D = diag(d, d) must reproduce the scalar-D local matrices
    bitwise-close (same weak form)."""
    verts = _f64([
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
        [[1.0, 0.0], [2.0, 0.5], [1.0, 1.5]],
    ])
    areas = _f64([0.5, 0.75])
    v = _f64([1.0, 0.5])
    scalar = local_matrices(verts, areas, 0.37, v)
    tensor = local_matrices(verts, areas, jnp.diag(_f64([0.37, 0.37])), v)
    np.testing.assert_allclose(np.asarray(tensor.stiffness),
                               np.asarray(scalar.stiffness), atol=1e-15)
    np.testing.assert_allclose(np.asarray(tensor.advection),
                               np.asarray(scalar.advection), atol=1e-15)


def test_per_triangle_tensor_matches_constant_calls():
    """(n_tri, 2, 2) tensor fields vmap exactly like separate constant
    calls (the in_axes split in local_matrices)."""
    verts = _f64([
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
        [[1.0, 0.0], [2.0, 0.5], [1.0, 1.5]],
    ])
    areas = _f64([0.5, 0.75])
    v = _f64([1.0, 0.5])
    D_field = _f64([[[0.2, 0.05], [0.05, 0.03]],
                    [[0.1, -0.02], [-0.02, 0.4]]])
    field = local_matrices(verts, areas, D_field, v)
    for t in range(2):
        one = local_matrices(verts[t:t + 1], areas[t:t + 1], D_field[t], v)
        np.testing.assert_allclose(np.asarray(field.stiffness[t]),
                                   np.asarray(one.stiffness[0]),
                                   atol=1e-15)


def test_exact_solution_satisfies_tensor_pde():
    """The separable closed form really solves the anisotropic PDE —
    residual through problem_pde_residual (the PINN's exact code path,
    Hessian contraction) vanishes to machine precision; forcing the
    isotropic mean diffusivity must NOT satisfy it."""
    p = AnisotropicPlumeProblem(Dx=0.2, Dy=0.03, reaction=0.1)

    def u_exact(q):
        return p.analytical_solution(q.reshape(1, 3)).reshape(())

    pts = _f64([[1.0, 2.0, 3.0], [0.5, -1.0, 7.0], [4.0, 2.0, 0.4]])
    res = autodiff.problem_pde_residual(u_exact, pts, p,
                                        jnp.zeros(3), reaction=0.1)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-12)

    res_iso = autodiff.pde_residual(u_exact, pts, p.v, 0.115,
                                    jnp.zeros(3), reaction=0.1)
    assert float(jnp.max(jnp.abs(res_iso))) > 1e-4


def test_fem_converges_to_anisotropic_oracle():
    domain = Domain()
    p = AnisotropicPlumeProblem(Dx=0.2, Dy=0.02)
    errs = []
    for ms in (8, 16, 32):
        md = MeshData(create_mesh(ms, 20.0), domain, nt=64,
                      dtype=jnp.float64)
        s = CRBESolver(domain, p, md, solver_tol=1e-11)
        s.solve()
        errs.append(s.compute_errors(p.analytical_solution)[0])
    assert errs[1] < 0.5 * errs[0] and errs[2] < 0.6 * errs[1], errs


def test_constant_tensor_keeps_uniform_fast_paths():
    """A constant tensor is translation-invariant: the 15-scalar uniform
    operator and the O(1) patch assembly must match the ELL path."""
    domain = Domain()
    p = AnisotropicPlumeProblem(Dx=0.2, Dy=0.02)
    md = MeshData(create_mesh(16, 20.0), domain, nt=8, dtype=jnp.float64)
    kw = dict(solver_tol=1e-12, solver_maxiter=500)
    a = np.asarray(CRBESolver(domain, p, md, matvec_impl="ell",
                              **kw).solve())
    b = np.asarray(CRBESolver(domain, p, md, matvec_impl="uniform",
                              **kw).solve())
    c = np.asarray(CRBESolver(domain, p, md, matvec_impl="uniform",
                              assembly="patch", **kw).solve())
    np.testing.assert_allclose(b, a, atol=1e-12)
    np.testing.assert_allclose(c, b, atol=1e-12)


class _CrossTensorMMS(AdDifProblem):
    """Manufactured solution with a FULL tensor (Dxy != 0), variable in
    space. Tensor fields are FEM-only in the strong-form residual, so
    the source is built by autodiffing the FLUX field D(x) grad c and
    taking its exact divergence — validating the weak form's
    off-diagonal terms end to end."""

    variable_coefficients = True
    zero_source = False

    def __init__(self):
        super().__init__(jnp.asarray([0.6, 0.3]), 0.1)

    def diffusion_at(self, xy):
        xy = jnp.asarray(xy)
        base = jnp.asarray([[0.2, 0.05], [0.05, 0.1]], xy.dtype)
        # Smooth positive-definite scaling field.
        s = 1.0 + 0.3 * jnp.sin(0.2 * xy[..., 0]) * jnp.cos(
            0.15 * xy[..., 1]
        )
        return s[..., None, None] * base

    def c_exact(self, xyt):
        xyt = jnp.asarray(xyt)
        x, y, t = xyt[..., 0], xyt[..., 1], xyt[..., 2]
        return jnp.exp(-0.1 * t) * jnp.exp(-(x**2 + y**2) / 30.0)

    analytical_solution = c_exact

    def initial_condition_fn(self, xy):
        xy = jnp.asarray(xy)
        t0 = jnp.zeros(xy.shape[:-1] + (1,), dtype=xy.dtype)
        return self.c_exact(jnp.concatenate([xy, t0], axis=-1))

    def boundary_fn(self, xyt):
        return self.c_exact(jnp.asarray(xyt))

    def source_term(self, xyt):
        """c_t + v . grad c - div(D grad c) of the target, with the
        divergence term computed by autodiff of the FLUX field
        F(x, y, t) = D(x, y) grad c — exact for the variable tensor."""
        xyt = jnp.asarray(xyt)
        flat = xyt.reshape(-1, 3)

        def u_point(q):
            return self.c_exact(q.reshape(1, 3)).reshape(())

        def flux(q):
            g = jax.grad(u_point)(q)[:2]
            return jnp.squeeze(
                self.diffusion_at(q[None, :2]), axis=0
            ) @ g

        def residual_point(q):
            g = jax.grad(u_point)(q)
            jac = jax.jacfwd(flux)(q)  # (2 flux components, 3 coords)
            div = jac[0, 0] + jac[1, 1]
            return g[2] + self.v @ g[:2] - div

        s = jax.vmap(residual_point)(flat)
        return s.reshape(xyt.shape[:-1])


def test_variable_full_tensor_manufactured_convergence():
    """FEM converges to the target under a spatially varying FULL tensor
    (off-diagonal coupling included) — the weak form needs no D
    derivatives, so this exercises exactly what the strong-form residual
    cannot."""
    domain = Domain(Lx=20.0, Ly=20.0, T=2.0)
    p = _CrossTensorMMS()
    errs = []
    for ms in (8, 16):
        md = MeshData(create_mesh(ms, 20.0), domain, nt=32,
                      dtype=jnp.float64)
        s = CRBESolver(domain, p, md, solver_tol=1e-11)
        s.solve()
        errs.append(s.compute_errors(p.analytical_solution)[0])
    assert errs[1] < 0.6 * errs[0], errs


def test_variable_tensor_pinn_residual_raises():
    p = _CrossTensorMMS()
    pts = _f64([[1.0, 2.0, 3.0]])

    def u(q):
        return jnp.sum(q)

    with pytest.raises(NotImplementedError, match="weak form"):
        autodiff.problem_pde_residual(u, pts, p, jnp.zeros(1))


def test_reaction_composes_with_tensor():
    """Pure-decay oracle: with v=0, Dx=Dy=0 impossible (assembly needs
    SPD-ish), so check the plume x exp(-rt) factorization instead."""
    p0 = AnisotropicPlumeProblem(Dx=0.2, Dy=0.03)
    p1 = AnisotropicPlumeProblem(Dx=0.2, Dy=0.03, reaction=0.25)
    xyt = _f64([[1.0, -2.0, 4.0], [0.0, 0.0, 10.0]])
    a = np.asarray(p0.analytical_solution(xyt))
    b = np.asarray(p1.analytical_solution(xyt))
    np.testing.assert_allclose(b, a * np.exp(-0.25 * np.asarray(
        xyt[:, 2])), rtol=1e-12)


def test_fit_anisotropic_diffusion_recovers_tensor():
    """jax.grad flows through the tensor assembly: (Dx, Dy) recovered
    from snapshot observations via the solver adjoint."""
    from airpollution_tpu.diagnostics import inverse

    domain = Domain()
    md = MeshData(create_mesh(10, 20.0), domain, nt=9, dtype=jnp.float64)
    true = dict(Dx=0.3, Dy=0.05)
    idx = [2, 4, 6, 8]
    obs = inverse.solve_snapshots(
        AnisotropicPlumeProblem(**true), md, indices=idx, tol=1e-10,
        maxiter=300)
    result, losses = inverse.fit_anisotropic_diffusion(
        obs, md, snapshot_indices=idx, Dx0=0.1, Dy0=0.1, steps=60,
        lr=0.08, tol=1e-10, maxiter=300)
    assert losses[-1] < 0.05 * losses[0], losses[::15]
    assert abs(result["Dx"] - true["Dx"]) < 0.08, result
    assert abs(result["Dy"] - true["Dy"]) < 0.04, result
