"""Pallas TPU kernel: fused family-grid stencil SpMV.

The structured-stencil matvec (airpollution_tpu.ops.stencil) is the hot op
of the CRBE path — ~7 applications per implicit time step. This module
fuses all 15 shift-multiply-add terms into ONE Pallas kernel with every
operand VMEM-resident: the coefficient grids (~15 x c^2 x 4 B) plus the
three x/y family grids fit comfortably in the ~16 MB VMEM for meshes up to
~300x300 (at 256^2: coeffs ~3.9 MB, vectors ~1.6 MB), so the kernel runs a
single grid cell with no HBM round-trips between terms.

The XLA fallback (``stencil.stencil_matvec``) remains the default for
meshes that exceed the VMEM budget; ``stencil_matvec_pallas`` is
numerically identical (tests run it in interpreter mode on CPU and
compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from airpollution_tpu.ops.stencil import StencilPattern

# VMEM budget for choosing the fused kernel: 15 coeff grids + 3 x-grids +
# 3 y-grids + slack, in f32.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(pattern: StencilPattern, itemsize: int = 4) -> bool:
    n, c = pattern.n, pattern.c
    per_grid = (n * c) * itemsize  # H is the largest family grid
    return (15 + 6) * per_grid < _VMEM_BUDGET_BYTES


def _stencil_kernel(
    cHH, cHVu, cHDu, cHVd, cHDd,
    cVV, cVDl, cVHl, cVHr, cVDr,
    cDD, cDVr, cDHd, cDHu, cDVl,
    xH_ref, xV_ref, xD_ref,
    yH_ref, yV_ref, yD_ref,
    *, c: int,
):
    xH = xH_ref[:]
    xV = xV_ref[:]
    xD = xD_ref[:]
    pad = jnp.pad
    yH_ref[:] = (
        cHH[:] * xH
        + cHVu[:] * pad(xV[:, 1:], ((0, 1), (0, 0)))
        + cHDu[:] * pad(xD, ((0, 1), (0, 0)))
        + cHVd[:] * pad(xV[:, :c], ((1, 0), (0, 0)))
        + cHDd[:] * pad(xD, ((1, 0), (0, 0)))
    )
    yV_ref[:] = (
        cVV[:] * xV
        + cVDl[:] * pad(xD, ((0, 0), (1, 0)))
        + cVHl[:] * pad(xH[:c, :], ((0, 0), (1, 0)))
        + cVHr[:] * pad(xH[1:, :], ((0, 0), (0, 1)))
        + cVDr[:] * pad(xD, ((0, 0), (0, 1)))
    )
    yD_ref[:] = (
        cDD[:] * xD
        + cDVr[:] * xV[:, 1:]
        + cDHd[:] * xH[:c, :]
        + cDHu[:] * xH[1:, :]
        + cDVl[:] * xV[:, :c]
    )


def stencil_matvec_pallas(pattern: StencilPattern, coeffs: tuple, x_fam,
                          interpret: bool = False):
    """y = A @ x in family layout, as one fused Pallas kernel."""
    n, c = pattern.n, pattern.c
    nH, nV = n * c, c * n
    xH = x_fam[:nH].reshape(n, c)
    xV = x_fam[nH:nH + nV].reshape(c, n)
    xD = x_fam[nH + nV:].reshape(c, c)
    dtype = x_fam.dtype

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = partial(_stencil_kernel, c=c)
    yH, yV, yD = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, c), dtype),
            jax.ShapeDtypeStruct((c, n), dtype),
            jax.ShapeDtypeStruct((c, c), dtype),
        ),
        in_specs=[vmem] * 18,
        out_specs=(vmem, vmem, vmem),
        interpret=interpret,
    )(*coeffs, xH, xV, xD)
    return jnp.concatenate([yH.ravel(), yV.ravel(), yD.ravel()])
