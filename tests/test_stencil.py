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


def _canvas_oracle(md, problem, dt, order, convention="correct",
                   coeff_time=None, atol=1e-14):
    """assemble_canvas must equal the ELL route's
    assemble + extract_coefficients + permuted mass/diag (f64)."""
    from airpollution_tpu.models.crbe import assemble_canvas
    from airpollution_tpu.ops.stencil import get_pattern

    ops = assemble(md, problem, dt, order, convention,
                   coeff_time=coeff_time)
    pattern = get_pattern(md)
    ref_coeffs = extract_coefficients(pattern, ops.system.vals)
    perm = jnp.asarray(pattern.perm)

    coeffs, mass_fam, diag_fam = assemble_canvas(
        md, problem, dt, order, convention, coeff_time=coeff_time
    )
    for k, (got, want) in enumerate(zip(coeffs, ref_coeffs)):
        np.testing.assert_allclose(
            np.asarray(got).ravel(), np.asarray(want).ravel(),
            atol=atol, err_msg=f"term {k}"
        )
    np.testing.assert_allclose(np.asarray(mass_fam),
                               np.asarray(ops.mass_diag[perm]), atol=atol)
    np.testing.assert_allclose(np.asarray(diag_fam),
                               np.asarray(ops.system_diag[perm]),
                               atol=atol)


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("convention", ["correct", "reference"])
def test_assemble_canvas_equals_ell_route(order, convention):
    md = MeshData(create_mesh(9, 20.0), Domain(), nt=8,
                  dtype=jnp.float64)
    _canvas_oracle(md, Problem(), 0.13, order, convention)


def test_assemble_canvas_reaction_and_robin():
    md = MeshData(create_mesh(9, 20.0), Domain(), nt=8,
                  dtype=jnp.float64)
    p = Problem(reaction=0.37)
    p.robin_sides = {"bottom": 0.02, "left": 0.5}
    _canvas_oracle(md, p, 0.13, 2)


def test_assemble_canvas_obstacles():
    md = MeshData(create_mesh(17, 20.0), Domain(), nt=8,
                  dtype=jnp.float64)
    p = Problem()
    p.obstacles = ((-5.0, 0.0, -2.5, 2.5),)
    _canvas_oracle(md, p, 0.13, 1)


def test_assemble_canvas_variable_and_time_varying():
    from airpollution_tpu.problems import (
        RotatingPlumeProblem,
        TurningWindProblem,
    )

    md = MeshData(create_mesh(9, 20.0), Domain(), nt=8,
                  dtype=jnp.float64)
    _canvas_oracle(md, RotatingPlumeProblem(omega=0.1), 0.13, 1)
    _canvas_oracle(md, TurningWindProblem(speed=0.8, omega_t=0.2),
                   0.13, 2, coeff_time=3.7)


def test_assemble_canvas_rejects_unstructured():
    from airpollution_tpu.mesh.structured import Mesh
    from airpollution_tpu.models.crbe import assemble_canvas

    m = create_mesh(5, 20.0)
    md = MeshData(Mesh(points=m.points, triangles=m.triangles,
                       n_points_per_axis=None), Domain(), nt=4)
    with pytest.raises(ValueError, match="structured"):
        assemble_canvas(md, Problem(), 0.1, 1)


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
