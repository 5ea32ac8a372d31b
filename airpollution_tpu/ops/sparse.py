"""ELL sparse operators for the CR global matrices.

TPU-native replacement for the reference's scipy.sparse CSR/LIL stack
(crbe.py:10, :326-354, :397-404). The reference stores the global operators
as SuperLU-backed CSR, and applies Dirichlet rows by copying the matrix to
LIL and rewriting rows *every time step* (crbe.py:397-404) before a fresh LU
factorization (crbe.py:426).

Here the operator lives in a fixed-width ELL layout (values + column indices
as dense ``(n_rows, width)`` arrays): static shapes, a single contiguous
gather per SpMV, no format conversions, and Dirichlet rows are applied once
by masking values. The width is 5 for the CR mesh operators (each edge DOF
couples with at most the edges of its two adjacent triangles — see
``airpollution_tpu.mesh.topology.build_ell_pattern``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EllMatrix(NamedTuple):
    """Fixed-width sparse matrix: ``A[r, cols[r, k]] += vals[r, k]``.

    Padding slots carry value 0 and column 0, so SpMV gathers stay in-bounds
    and contribute nothing.
    """

    vals: jax.Array  # (n_rows, width)
    cols: jax.Array  # (n_rows, width) int32

    @property
    def n_rows(self) -> int:
        return self.vals.shape[0]

    @property
    def width(self) -> int:
        return self.vals.shape[1]


def ell_matvec(A: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x: one gather + multiply + row-sum (VPU-friendly, no scatter)."""
    return jnp.sum(A.vals * x[A.cols], axis=1)


def ell_from_entries(
    entry_vals: jax.Array,
    entry_to_slot: jax.Array,
    cols: jax.Array,
) -> EllMatrix:
    """Assemble an ELL matrix from per-entry local values.

    ``entry_vals`` are the flattened local-matrix entries (e.g. 9 * n_tri
    values in (tri, a, b) order) and ``entry_to_slot`` maps each to its flat
    ELL slot (precomputed on host — the scatter is one ``segment_sum``).
    This replaces the reference's Python triple-loop triplet assembly
    (crbe.py:336-354).
    """
    n_rows, width = cols.shape
    flat = jax.ops.segment_sum(
        entry_vals, entry_to_slot, num_segments=n_rows * width
    )
    return EllMatrix(vals=flat.reshape(n_rows, width), cols=cols)


def ell_diagonal(A: EllMatrix, diag_slot: jax.Array) -> jax.Array:
    """Extract the diagonal given precomputed flat diagonal slot ids."""
    return A.vals.reshape(-1)[diag_slot]


def ell_mask_dirichlet_rows(
    A: EllMatrix, boundary_mask: jax.Array, diag_slot: jax.Array
) -> EllMatrix:
    """Replace Dirichlet rows by identity rows, once.

    Equivalent to the reference's per-step LIL row surgery
    (``A.rows[seg] = [seg]; A.data[seg] = [1.0]``, crbe.py:399-401), but
    applied a single time to a static operator: boundary rows get all slots
    zeroed and their diagonal slot set to 1.
    """
    vals = jnp.where(boundary_mask[:, None], 0.0, A.vals)
    flat = vals.reshape(-1)
    diag_vals = flat[diag_slot]
    flat = flat.at[diag_slot].set(jnp.where(boundary_mask, 1.0, diag_vals))
    return EllMatrix(vals=flat.reshape(A.vals.shape), cols=A.cols)
