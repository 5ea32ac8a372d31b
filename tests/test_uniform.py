"""Tests for the translation-invariant (uniform) stencil operator.

The structured mesh's assembled CRBE operator is translation-invariant
(ops/uniform.py docstring); these tests pin that claim numerically against
the canvas stencil path, which is itself tested against the ELL/dense
oracles (test_stencil.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver, assemble
from airpollution_tpu.ops import stencil as st
from airpollution_tpu.ops import uniform as un
from airpollution_tpu.problems import Domain, Problem


def _setup(ms, order=1, conv="correct", dtype=jnp.float32, nt=33):
    domain = Domain(Lx=20.0, Ly=20.0, T=10.0)
    md = MeshData(create_mesh(ms, 20.0), domain, nt=nt, dtype=dtype)
    dt = domain.T / (md.nt - 1)
    ops = assemble(md, Problem(), dt, order, conv)
    pattern = st.get_pattern(md)
    spec = un.build_uniform_spec(pattern)
    return md, ops, pattern, spec


@pytest.mark.parametrize("ms", [4, 8, 16])
@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("conv", ["correct", "reference"])
def test_uniform_matches_canvas_matvec(ms, order, conv):
    """System matvec: scalar-coefficient form == canvas form everywhere
    (boundary rows included). float32 meshes carry ~1e-7 relative rounding
    noise in the assembled canvases (non-binary-exact spacing), hence the
    tolerance."""
    md, ops, pattern, spec = _setup(ms, order, conv)
    coeffs = st.extract_coefficients(pattern, ops.system.vals)
    consts = un.extract_constants(spec, ops.system.vals)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(md.number_of_segments),
                    dtype=jnp.float32)
    y_canvas = np.asarray(st.stencil_matvec(pattern, coeffs, x))
    y_uniform = np.asarray(un.uniform_matvec(spec, consts, x))
    # float32 rounding of the canvas values scales with the operator's
    # magnitude (the diagonal is mass-dominated at coarse meshes).
    atol = 3e-7 * float(np.abs(y_canvas).max())
    np.testing.assert_allclose(y_uniform, y_canvas, rtol=0, atol=atol)


def test_uniform_exact_in_float64():
    """With float64 mesh arrays the rounding noise vanishes: the uniform
    operator IS the assembled operator to ~1e-14."""
    md, ops, pattern, spec = _setup(16, dtype=jnp.float64)
    coeffs = st.extract_coefficients(pattern, ops.system.vals)
    consts = un.extract_constants(spec, ops.system.vals)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(md.number_of_segments))
    y_canvas = np.asarray(st.stencil_matvec(pattern, coeffs, x))
    y_uniform = np.asarray(un.uniform_matvec(spec, consts, x))
    np.testing.assert_allclose(y_uniform, y_canvas, rtol=0, atol=1e-13)


def test_uniform_ka_matches_on_interior_rows():
    """The unmasked K+A (Crank-Nicolson RHS operator) is uniform only on
    interior rows — its boundary rows aggregate a single triangle. The
    uniform path drops those rows; run_time_loop discards them anyway
    (crbe.py:402)."""
    md, ops, pattern, spec = _setup(8, order=2, dtype=jnp.float64)
    coeffs = st.extract_coefficients(pattern, ops.ka.vals)
    consts = un.extract_constants(spec, ops.ka.vals)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(md.number_of_segments))
    y_canvas = np.asarray(st.stencil_matvec(pattern, coeffs, x))
    y_uniform = np.asarray(
        un.uniform_matvec(spec, consts, x, boundary="drop")
    )
    interior = ~np.asarray(md.boundary_mask)[pattern.perm]
    np.testing.assert_allclose(
        y_uniform[interior], y_canvas[interior], rtol=0, atol=1e-13
    )
    # dropped rows are exactly the family-layout boundary rows
    np.testing.assert_array_equal(y_uniform[~interior], 0.0)


@pytest.mark.parametrize("order", [1, 2])
def test_uniform_solver_matches_stencil_path(order):
    """Full time loop: matvec_impl='uniform' reproduces the canvas stencil
    path to solver tolerance."""
    domain = Domain(Lx=20.0, Ly=20.0, T=10.0)
    problem = Problem()
    md = MeshData(create_mesh(16, 20.0), domain, nt=33)
    ref = CRBESolver(domain, problem, md, matvec_impl="stencil",
                     time_scheme_order=order)
    u_ref = np.asarray(ref.solve())
    uni = CRBESolver(domain, problem, md, matvec_impl="uniform",
                     time_scheme_order=order)
    u_uni = np.asarray(uni.solve())
    np.testing.assert_allclose(u_uni, u_ref, rtol=0, atol=2e-5)


def test_uniform_requires_structured_mesh():
    from airpollution_tpu.mesh.structured import create_unstructured_mesh

    domain = Domain(Lx=20.0, Ly=20.0, T=10.0)
    md = MeshData(create_unstructured_mesh(8, 20.0), domain, nt=9)
    s = CRBESolver(domain, Problem(), md, matvec_impl="uniform")
    with pytest.raises(ValueError, match="structured"):
        s.solve()


def test_uniform_spec_guards():
    domain = Domain(Lx=20.0, Ly=20.0, T=10.0)
    md = MeshData(create_mesh(2, 20.0), domain, nt=9)
    pattern = st.get_pattern(md)
    with pytest.raises(ValueError, match=">= 3"):
        un.build_uniform_spec(pattern)


def test_family_constants_pick_interior_values():
    md, ops, pattern, spec = _setup(8, dtype=jnp.float64)
    mass_consts = np.asarray(un.family_constants(spec, ops.mass_diag))
    # every interior DOF of a family has the same mass value
    bm = np.asarray(md.boundary_mask)
    mass = np.asarray(ops.mass_diag)
    n, c = pattern.n, pattern.c
    fam_of = np.empty(md.number_of_segments, dtype=np.int64)
    fam_of[pattern.perm[: n * c]] = 0
    fam_of[pattern.perm[n * c: n * c + c * n]] = 1
    fam_of[pattern.perm[n * c + c * n:]] = 2
    for f in range(3):
        sel = (fam_of == f) & ~bm
        np.testing.assert_allclose(mass[sel], mass_consts[f], rtol=1e-12)


def test_lite_spec_rejects_center_extraction():
    """A make_spec_lite spec carries -1 sentinels: feeding it to the
    center-sample extractors raises instead of gathering slot-0 garbage
    (advisor finding, round 1)."""
    spec = un.make_spec_lite(9)
    vals = jnp.ones((200, 15))
    with pytest.raises(ValueError, match="lite"):
        un.extract_constants(spec, vals)
    with pytest.raises(ValueError, match="lite"):
        un.family_constants(spec, jnp.ones(200))
