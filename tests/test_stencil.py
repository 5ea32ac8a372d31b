"""Tests for the structured-stencil SpMV fast path."""

import numpy as np
import jax.numpy as jnp
import pytest

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver, assemble
from airpollution_tpu.ops import sparse
from airpollution_tpu.ops.stencil import (
    build_stencil_pattern,
    extract_coefficients,
    stencil_matvec,
)
from airpollution_tpu.problems import Domain, Problem


@pytest.mark.parametrize("n", [2, 3, 5, 9, 17])
def test_stencil_matvec_equals_ell(n):
    """The family-grid stencil reproduces the ELL SpMV exactly on the
    masked system and on K + A, for random vectors."""
    domain = Domain()
    md = MeshData(create_mesh(n, 20.0), domain, nt=4, dtype=jnp.float64)
    problem = Problem()
    ops = assemble(md, problem, 0.1, 1, "reference")
    pattern = build_stencil_pattern(md._host_t2s, md._host_ell_cols, n)

    # Permutation is a bijection over all DOFs.
    assert sorted(pattern.perm.tolist()) == list(range(md.number_of_segments))

    rng = np.random.default_rng(n)
    x = jnp.asarray(rng.normal(size=md.number_of_segments))
    for E in (ops.system, ops.ka):
        y_ell = np.asarray(sparse.ell_matvec(E, x))
        coeffs = extract_coefficients(pattern, E.vals)
        y_fam = stencil_matvec(pattern, coeffs, x[jnp.asarray(pattern.perm)])
        y_stencil = np.asarray(y_fam)[pattern.inv_perm]
        np.testing.assert_allclose(y_stencil, y_ell, atol=1e-12)


def test_full_solve_stencil_equals_ell():
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(12, 20.0), domain, nt=16, dtype=jnp.float64)
    for order in (1, 2):
        s_ell = CRBESolver(domain, problem, md, time_scheme_order=order,
                           solver_tol=1e-12, matvec_impl="ell")
        s_st = CRBESolver(domain, problem, md, time_scheme_order=order,
                          solver_tol=1e-12, matvec_impl="stencil")
        np.testing.assert_allclose(
            np.asarray(s_st.solve()), np.asarray(s_ell.solve()),
            atol=1e-9,
        )


def test_stencil_requires_structured_mesh():
    from airpollution_tpu.mesh.structured import Mesh

    m = create_mesh(5, 20.0)
    unstructured = Mesh(points=m.points, triangles=m.triangles,
                        n_points_per_axis=None)
    md = MeshData(unstructured, Domain(), nt=4)
    with pytest.raises(ValueError):
        CRBESolver(Domain(), Problem(), md, matvec_impl="stencil").solve()
    # auto falls back to ELL silently.
    s = CRBESolver(Domain(), Problem(), md, matvec_impl="auto")
    assert not s._use_stencil()
