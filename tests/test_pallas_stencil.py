"""Tests for the fused Pallas stencil kernel (interpreter mode on CPU)."""

import pytest as _pytest

pytestmark = _pytest.mark.kernels


import numpy as np
import jax
import jax.numpy as jnp
import pytest

from airpollution_tpu.mesh import MeshData, create_mesh
from airpollution_tpu.models.crbe import CRBESolver, assemble
from airpollution_tpu.ops import sparse
from airpollution_tpu.ops.pallas_stencil import (
    fits_vmem,
    stencil_matvec_pallas,
)
from airpollution_tpu.ops.stencil import (
    build_stencil_pattern,
    extract_coefficients,
)
from airpollution_tpu.problems import Domain, Problem


@pytest.mark.parametrize("n", [3, 9])
def test_pallas_kernel_matches_ell(n):
    domain = Domain()
    md = MeshData(create_mesh(n, 20.0), domain, nt=4)
    ops = assemble(md, Problem(), 0.1, 1, "reference")
    pattern = build_stencil_pattern(md._host_t2s, md._host_ell_cols, n)
    assert fits_vmem(pattern)
    coeffs = extract_coefficients(pattern, ops.system.vals)
    x = jnp.asarray(
        np.random.default_rng(n).normal(size=md.number_of_segments),
        jnp.float32,
    )
    y_ell = np.asarray(sparse.ell_matvec(ops.system, x))
    y_fam = stencil_matvec_pallas(
        pattern, coeffs, x[jnp.asarray(pattern.perm)], interpret=True
    )
    y = np.asarray(y_fam)[pattern.inv_perm]
    np.testing.assert_allclose(y, y_ell, atol=1e-5)


def test_full_solve_pallas_matches_stencil():
    domain, problem = Domain(), Problem()
    md = MeshData(create_mesh(10, 20.0), domain, nt=8)
    s_ref = CRBESolver(domain, problem, md, solver_tol=1e-8,
                       matvec_impl="stencil")
    s_pl = CRBESolver(domain, problem, md, solver_tol=1e-8,
                      matvec_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(s_pl.solve()), np.asarray(s_ref.solve()), atol=1e-5
    )


def test_vmem_guard():
    assert not fits_vmem(
        type("P", (), {"n": 2049, "c": 2048})()
    )
