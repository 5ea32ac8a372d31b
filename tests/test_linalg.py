"""Tests for ops.linalg iterative solvers against dense oracles."""

import numpy as np
import jax.numpy as jnp

from airpollution_tpu.ops import linalg


def _random_spd(n, rng):
    A = rng.normal(size=(n, n))
    return A @ A.T + n * np.eye(n)


def test_cg_matches_dense_solve():
    rng = np.random.default_rng(0)
    A = _random_spd(40, rng)
    b = rng.normal(size=40)
    x_ref = np.linalg.solve(A, b)
    res = linalg.cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8)
    assert int(res.iterations) <= 40


def test_bicgstab_nonsymmetric():
    rng = np.random.default_rng(1)
    # Diagonally dominant nonsymmetric system (like M + dt*(K+A)).
    A = rng.normal(size=(60, 60)) * 0.1 + np.diag(rng.uniform(2, 3, 60))
    b = rng.normal(size=60)
    x_ref = np.linalg.solve(A, b)
    res = linalg.bicgstab(
        lambda x: jnp.asarray(A) @ x,
        jnp.asarray(b),
        tol=1e-12,
        precond=linalg.jacobi_preconditioner(jnp.asarray(np.diag(A))),
    )
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7, atol=1e-9)


def test_warm_start_reduces_iterations():
    rng = np.random.default_rng(2)
    A = np.diag(rng.uniform(2, 3, 50)) + 0.05 * rng.normal(size=(50, 50))
    b = rng.normal(size=50)
    x_ref = np.linalg.solve(A, b)
    cold = linalg.bicgstab(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), tol=1e-10)
    warm = linalg.bicgstab(
        lambda x: jnp.asarray(A) @ x,
        jnp.asarray(b),
        x0=jnp.asarray(x_ref + 1e-8 * rng.normal(size=50)),
        tol=1e-10,
    )
    assert int(warm.iterations) < int(cold.iterations)


def test_maxiter_cap():
    rng = np.random.default_rng(3)
    A = _random_spd(30, rng)
    b = rng.normal(size=30)
    res = linalg.cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), tol=1e-14,
                    maxiter=3)
    assert int(res.iterations) == 3


def test_gmres_nonsymmetric_matches_dense():
    rng = np.random.default_rng(5)
    A = rng.normal(size=(50, 50)) * 0.1 + np.diag(rng.uniform(2, 3, 50))
    b = rng.normal(size=50)
    x_ref = np.linalg.solve(A, b)
    res = linalg.gmres(
        lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
        tol=1e-10, restart=25, maxiter=20,
        precond=linalg.jacobi_preconditioner(jnp.asarray(np.diag(A))),
    )
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6,
                               atol=1e-8)


def test_gmres_inside_fem_step():
    """GMRES solves the actual masked CRBE system (swap-in check for the
    Krylov layer)."""
    import jax
    from airpollution_tpu.mesh import MeshData, create_mesh
    from airpollution_tpu.models.crbe import assemble
    from airpollution_tpu.ops import sparse
    from airpollution_tpu.problems import Domain, Problem

    domain = Domain()
    md = MeshData(create_mesh(8, 20.0), domain, nt=8, dtype=jnp.float64)
    problem = Problem()
    ops = assemble(md, problem, domain.T / 7, 1, "reference")
    u0 = problem.initial_condition_fn(md.midpoints)
    b = jnp.where(md.boundary_mask, 0.0, ops.mass_diag * u0)
    matvec = lambda x: sparse.ell_matvec(ops.system, x)
    res = linalg.gmres(matvec, b, tol=1e-11, restart=30, maxiter=30,
                       precond=linalg.jacobi_preconditioner(ops.system_diag))
    res_b = linalg.bicgstab(matvec, b, tol=1e-12,
                            precond=linalg.jacobi_preconditioner(
                                ops.system_diag))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_b.x),
                               atol=1e-8)
