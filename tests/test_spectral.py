"""Tests for the FFT-based spectral preconditioner (ops/spectral.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import airpollution_tpu as apt
from airpollution_tpu.models.crbe import CRBESolver, assemble
from airpollution_tpu.ops import spectral, stencil as sm
from airpollution_tpu.problems import Domain, Problem


def _setup(ms=16, nt=8, order=1):
    md = apt.MeshData(apt.create_mesh(ms, 20.0), Domain(), nt=nt)
    dt = Domain().T / (nt - 1)
    ops = assemble(md, Problem(), dt, order)
    pattern = sm.get_pattern(md)
    coeffs = sm.extract_coefficients(pattern, ops.system.vals)
    return md, pattern, coeffs


def test_symbol_inverts_interior_operator_exactly():
    """precond(S x) == x (to fp roundoff) for x supported deep in the
    interior, where the true operator equals the block-circulant one."""
    md, pattern, coeffs = _setup()
    h = 40.0 / 15
    mid = np.asarray(md.midpoints)[np.asarray(pattern.perm)]
    deep = np.abs(mid).max(axis=1) < 20 - 2.5 * h
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.where(deep, rng.normal(size=mid.shape[0]), 0.0),
                    jnp.float32)
    precond = spectral.spectral_preconditioner(pattern, coeffs)
    z = np.asarray(precond(sm.stencil_matvec(pattern, coeffs, x)))
    np.testing.assert_allclose(z, np.asarray(x), atol=2e-6)


@pytest.mark.parametrize("order", [1, 2])
def test_spectral_solver_matches_jacobi_and_cuts_iterations(order):
    md = apt.MeshData(apt.create_mesh(32, 20.0), Domain(), nt=16)
    runs = {}
    for pc in ("jacobi", "spectral"):
        s = CRBESolver(Domain(), Problem(), md, matvec_impl="stencil",
                       solver_tol=1e-8, time_scheme_order=order,
                       preconditioner=pc)
        u = np.asarray(s.solve(store_solutions=False, collect_iters=True))
        runs[pc] = (u, float(np.asarray(s.solver_iterations).mean()))
    np.testing.assert_allclose(runs["spectral"][0], runs["jacobi"][0],
                               atol=1e-5)
    assert runs["spectral"][1] < runs["jacobi"][1]
    assert runs["spectral"][1] <= 3.0  # near-exact interior inverse


def test_spectral_requires_stencil_path():
    md = apt.MeshData(apt.create_mesh(8, 20.0), Domain(), nt=4)
    s = CRBESolver(Domain(), Problem(), md, matvec_impl="ell",
                   preconditioner="spectral")
    with pytest.raises(ValueError):
        s.solve(store_solutions=False)
    s = CRBESolver(Domain(), Problem(), md, matvec_impl="fused",
                   preconditioner="spectral")
    with pytest.raises(ValueError):
        s.solve(store_solutions=False)
    with pytest.raises(ValueError):
        CRBESolver(Domain(), Problem(), md, preconditioner="nope")
