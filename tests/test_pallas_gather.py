"""VMEM-resident gather SpMV (ops/pallas_gather) vs the ELL reference.

Correctness in interpret mode; the TPU keep-or-reject perf data lives
in results_snapshot/vmem_gather_ab.csv (scripts/tpu_vmem_gather_ab.py).
"""

import pytest as _pytest

pytestmark = _pytest.mark.kernels

import numpy as np
import jax.numpy as jnp
import pytest

import airpollution_tpu as apt
from airpollution_tpu.mesh.structured import create_unstructured_mesh
from airpollution_tpu.models.crbe import assemble
from airpollution_tpu.ops import sparse
from airpollution_tpu.ops.pallas_gather import ell_matvec_vmem, fits_vmem


@pytest.mark.parametrize("block_rows", [128, 512])
def test_vmem_gather_matches_ell(block_rows):
    md = apt.MeshData(create_unstructured_mesh(17, 20.0, seed=1),
                      apt.Domain(), nt=4)
    ops = assemble(md, apt.Problem(), 0.05, 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=md.number_of_segments)
                    .astype(np.float32))
    y_ref = sparse.ell_matvec(ops.system, x)
    y = ell_matvec_vmem(ops.system, x, block_rows=block_rows,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-6)


def test_fits_vmem_budget():
    assert fits_vmem(197_120)        # 257^2-unstructured
    assert not fits_vmem(40_000_000)  # 4097^2-scale states do not
