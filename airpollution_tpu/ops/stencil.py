"""Gather-free stencil SpMV for structured CR meshes (the TPU fast path).

On the structured triangulation (airpollution_tpu.mesh.structured) the CR
edge DOFs form three regular families — horizontal edges H(i,j) (n x c
grid), vertical edges V(i,j) (c x n) and diagonal edges D(i,j) (c x c),
with c = n - 1 cells per axis — and every operator row couples a DOF only
with fixed-offset neighbors in these grids. The ELL SpMV's row gather
(``x[cols]``) is catastrophically slow on TPU (measured 12.3 ms vs 0.57 ms
for the same memory traffic without the gather at 197k DOFs, 21x), so this
module reorders the solve into family-grid layout where the matvec is 15
static shift-multiply-add terms: pure VPU work, fully fused by XLA, zero
gathers per step.

The coefficient grids are extracted from the assembled ELL operator once
per solve (a single gather outside the time loop); the time loop then runs
entirely in family layout and the snapshots are permuted back to the
global DOF order at the end.

Derivation of the neighbor table (cell (i,j), triangles
A = (v00, v10, v11), B = (v00, v11, v01), local edge order
[(v1,v2), (v2,v0), (v0,v1)] per crbe.py:117):
  t2s[A] = [V(i+1,j), D(i,j), H(i,j)]
  t2s[B] = [H(i,j+1), V(i,j), D(i,j)]
so each H row couples {H, V(i+1,j), D(i,j), V(i,j-1), D(i,j-1)}, each V row
{V, D(i-1,j), H(i-1,j), H(i,j+1), D(i,j)}, each D row
{D, V(i+1,j), H(i,j), H(i,j+1), V(i,j)}.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class StencilPattern:
    """Host-precomputed static data for the family-grid stencil.

    perm: (n_seg,) family-layout position -> global DOF id.
    inv_perm: (n_seg,) global DOF id -> family-layout position.
    term_slots: (15, ...) flat indices into the ELL value array, one grid
      per stencil term (0 where invalid).
    term_valid: matching validity masks (False where the neighbor does not
      exist; extracted coefficients are zeroed there).
    """

    n: int
    c: int
    perm: np.ndarray
    inv_perm: np.ndarray
    term_slots: tuple
    term_valid: tuple

    @property
    def shapes(self):
        n, c = self.n, self.c
        return {"H": (n, c), "V": (c, n), "D": (c, c)}


def _family_ids(t2s: np.ndarray, n: int):
    """Global DOF id grids for the three edge families."""
    c = n - 1
    jj, ii = np.meshgrid(np.arange(c), np.arange(c), indexing="ij")
    A = 2 * (jj * c + ii)  # triangle A of cell (i, j)
    B = A + 1

    H = np.empty((n, c), dtype=np.int64)
    H[:c, :] = t2s[A, 2]  # H(i, j) from tri A(i, j)
    H[c, :] = t2s[B[c - 1, :], 0]  # top row from tri B(i, c-1)

    V = np.empty((c, n), dtype=np.int64)
    V[:, :c] = t2s[B, 1]  # V(i, j) from tri B(i, j)
    V[:, c] = t2s[A[:, c - 1], 0]  # right column from tri A(c-1, j)

    D = t2s[A, 1].astype(np.int64)
    return H, V, D


def build_family_perm(t2s, n: int, ids=None):
    """Family-layout permutation only (no per-term ELL slot grids).

    The slot grids cost 15 x (n, n) int64 host arrays (~0.5 GB at 2049^2)
    and are only needed to EXTRACT coefficients from an assembled ELL
    operator; the patch-assembled uniform path (ops/uniform.py
    patch_constants) needs just the permutation. ``ids`` accepts
    precomputed ``_family_ids`` output to avoid recomputing it."""
    H, V, D = ids if ids is not None else _family_ids(np.asarray(t2s), n)
    perm = np.concatenate([H.ravel(), V.ravel(), D.ravel()]).astype(np.int32)
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv_perm


def get_family_perm(mesh_data):
    """Build (and cache) perm/inv_perm without the full pattern; reuses
    the pattern's arrays when one is already cached."""
    pattern = getattr(mesh_data, "_stencil_pattern", None)
    if pattern is not None:
        return pattern.perm, pattern.inv_perm
    cached = getattr(mesh_data, "_family_perm", None)
    if cached is None:
        cached = build_family_perm(
            mesh_data._host_t2s, mesh_data.structured_n
        )
        mesh_data._family_perm = cached
    return cached


def build_stencil_pattern(t2s, ell_cols, n: int) -> StencilPattern:
    """Precompute permutations and per-term ELL slot grids (host, once)."""
    t2s = np.asarray(t2s)
    ell_cols = np.asarray(ell_cols)
    width = ell_cols.shape[1]
    c = n - 1
    H, V, D = _family_ids(t2s, n)

    perm, inv_perm = build_family_perm(t2s, n, ids=(H, V, D))

    def term(rows, col_grid, valid):
        """Flat ELL slot of entry (row, col) per grid cell, + validity."""
        match = ell_cols[rows] == col_grid[..., None]  # (grid..., width)
        k = np.argmax(match, axis=-1)
        found = match.any(axis=-1) & valid
        slots = (rows * width + k).astype(np.int32)
        slots[~found] = 0
        return slots, found

    def grid_like(shape):
        return np.zeros(shape, dtype=np.int64), np.zeros(shape, dtype=bool)

    terms = []
    # --- H rows (shape (n, c)) ---
    terms.append(term(H, H, np.ones((n, c), bool)))  # 1 HH
    col, val = grid_like((n, c))
    col[:c, :], val[:c, :] = V[:, 1:], True  # 2 V(i+1, j), tri A(i, j)
    terms.append(term(H, col, val))
    col, val = grid_like((n, c))
    col[:c, :], val[:c, :] = D, True  # 3 D(i, j)
    terms.append(term(H, col, val))
    col, val = grid_like((n, c))
    col[1:, :], val[1:, :] = V[:, :c], True  # 4 V(i, j-1), tri B(i, j-1)
    terms.append(term(H, col, val))
    col, val = grid_like((n, c))
    col[1:, :], val[1:, :] = D, True  # 5 D(i, j-1)
    terms.append(term(H, col, val))
    # --- V rows (shape (c, n)) ---
    terms.append(term(V, V, np.ones((c, n), bool)))  # 6 VV
    col, val = grid_like((c, n))
    col[:, 1:], val[:, 1:] = D, True  # 7 D(i-1, j), tri A(i-1, j)
    terms.append(term(V, col, val))
    col, val = grid_like((c, n))
    col[:, 1:], val[:, 1:] = H[:c, :], True  # 8 H(i-1, j)
    terms.append(term(V, col, val))
    col, val = grid_like((c, n))
    col[:, :c], val[:, :c] = H[1:, :], True  # 9 H(i, j+1), tri B(i, j)
    terms.append(term(V, col, val))
    col, val = grid_like((c, n))
    col[:, :c], val[:, :c] = D, True  # 10 D(i, j)
    terms.append(term(V, col, val))
    # --- D rows (shape (c, c)) ---
    terms.append(term(D, D, np.ones((c, c), bool)))  # 11 DD
    terms.append(term(D, V[:, 1:], np.ones((c, c), bool)))  # 12 V(i+1, j)
    terms.append(term(D, H[:c, :], np.ones((c, c), bool)))  # 13 H(i, j)
    terms.append(term(D, H[1:, :], np.ones((c, c), bool)))  # 14 H(i, j+1)
    terms.append(term(D, V[:, :c], np.ones((c, c), bool)))  # 15 V(i, j)

    return StencilPattern(
        n=n, c=c, perm=perm, inv_perm=inv_perm,
        term_slots=tuple(s for s, _ in terms),
        term_valid=tuple(v for _, v in terms),
    )


def canvases_from_local(n: int, local, local_mass=None):
    """Stencil coefficient canvases DIRECTLY from per-triangle local
    matrices — the structured-mesh shortcut past global assembly.

    ``ell_from_entries`` scatters 9*n_tri entries into the ELL operator
    (a sort-based segment reduction — 0.58 s at 1025^2) and
    :func:`extract_coefficients` gathers them back out (0.15 s); on a
    structured mesh both are pure layout shuffles, because each of the
    15 stencil terms is a FIXED 1-2-term combination of local-matrix
    slices (the neighbor-table derivation in the module docstring: the
    only triangles coupling a family pair are tri A/B of the one or two
    adjacent cells). This function emits each term canvas as those
    slices placed with static pads — zero scatters, zero gathers.

    ``local``: (n_tri, 3, 3) local matrices in mesh triangle order
    (tri A of cell (row j, col i) at index 2*(j*c + i), tri B at +1 —
    mesh/structured.py contract). ``local_mass``: optional (n_tri, 3)
    diagonal local mass entries.

    Returns ``(coeffs, mass)``: the 15-tuple in
    :func:`extract_coefficients` order (canvas shapes H (n, c),
    V (c, n), D (c, c)) of the UNMASKED assembled operator — the
    per-DOF diagonal adds (global mass, reaction/Robin alpha) and the
    Dirichlet identity masking are the caller's (models/crbe.
    assemble_canvas), exactly as they are for the ELL route — and the
    assembled mass canvases (mH, mV, mD), or None without
    ``local_mass``.
    """
    c = n - 1
    L = local.reshape(c, c, 2, 3, 3)
    LA, LB = L[:, :, 0], L[:, :, 1]
    dtype = local.dtype

    def place(shape, src, dst_slice):
        out = jnp.zeros(shape, dtype)
        return out.at[dst_slice].set(src)

    # --- H rows (n, c): H(j,i) = edge 2 of tri A(j,i) [j<c] and edge 0
    # of tri B(j-1,i) [j>=1] ---
    cHH = (place((n, c), LA[:, :, 2, 2], np.s_[:c, :])
           .at[1:, :].add(LB[:, :, 0, 0]))
    cHVu = place((n, c), LA[:, :, 2, 0], np.s_[:c, :])
    cHDu = place((n, c), LA[:, :, 2, 1], np.s_[:c, :])
    cHVd = place((n, c), LB[:, :, 0, 1], np.s_[1:, :])
    cHDd = place((n, c), LB[:, :, 0, 2], np.s_[1:, :])
    # --- V rows (c, n): V(j,i) = edge 1 of tri B(j,i) [i<c] and edge 0
    # of tri A(j,i-1) [i>=1] ---
    cVV = (place((c, n), LB[:, :, 1, 1], np.s_[:, :c])
           .at[:, 1:].add(LA[:, :, 0, 0]))
    cVDl = place((c, n), LA[:, :, 0, 1], np.s_[:, 1:])
    cVHl = place((c, n), LA[:, :, 0, 2], np.s_[:, 1:])
    cVHr = place((c, n), LB[:, :, 1, 0], np.s_[:, :c])
    cVDr = place((c, n), LB[:, :, 1, 2], np.s_[:, :c])
    # --- D rows (c, c): D(j,i) = edge 1 of tri A(j,i) AND edge 2 of
    # tri B(j,i) ---
    cDD = LA[:, :, 1, 1] + LB[:, :, 2, 2]
    cDVr = LA[:, :, 1, 0]
    cDHd = LA[:, :, 1, 2]
    cDHu = LB[:, :, 2, 0]
    cDVl = LB[:, :, 2, 1]

    coeffs = (cHH, cHVu, cHDu, cHVd, cHDd,
              cVV, cVDl, cVHl, cVHr, cVDr,
              cDD, cDVr, cDHd, cDHu, cDVl)
    if local_mass is None:
        return coeffs, None
    m = local_mass.reshape(c, c, 2, 3)
    mA, mB = m[:, :, 0], m[:, :, 1]
    mH = (place((n, c), mA[:, :, 2], np.s_[:c, :])
          .at[1:, :].add(mB[:, :, 0]))
    mV = (place((c, n), mB[:, :, 1], np.s_[:, :c])
          .at[:, 1:].add(mA[:, :, 0]))
    mD = mA[:, :, 1] + mB[:, :, 2]
    return coeffs, (mH, mV, mD)


def extract_coefficients(pattern: StencilPattern, ell_vals) -> tuple:
    """Coefficient grids from the flat ELL values (one gather, per solve)."""
    flat = ell_vals.reshape(-1)
    return tuple(
        jnp.where(jnp.asarray(v), flat[jnp.asarray(s)], 0.0)
        for s, v in zip(pattern.term_slots, pattern.term_valid)
    )


def transpose_coefficients(coeffs: tuple) -> tuple:
    """Coefficient canvases of the TRANSPOSED operator, same 15-term
    structure: ``stencil_matvec(pattern, transpose_coefficients(c), x)
    == A^T x``.

    Each directed stencil term (family_r -> family_c at a fixed offset)
    has a unique reverse term (family_c -> family_r at the negated
    offset); transposing re-slots each canvas into its reverse term's
    grid, shifted to index by the NEW row. Diagonal terms (HH, VV, DD)
    are fixed points. Feeds the adjoint sweep of the differentiable
    fused engines (ops/pallas_hbm.chebyshev_apply_canvas_hbm with these
    canvases == the same Chebyshev polynomial of A^T)."""
    (cHH, cHVu, cHDu, cHVd, cHDd,
     cVV, cVDl, cVHl, cVHr, cVDr,
     cDD, cDVr, cDHd, cDHu, cDVl) = coeffs
    pad = jnp.pad
    c = cDD.shape[0]
    return (
        cHH,
        pad(cVHl[:, 1:], ((0, 1), (0, 0))),   # H->V(up):   rev of V->H(left)
        pad(cDHd, ((0, 1), (0, 0))),          # H->D(up):   rev of D->H(down)
        pad(cVHr[:, :c], ((1, 0), (0, 0))),   # H->V(down): rev of V->H(right)
        pad(cDHu, ((1, 0), (0, 0))),          # H->D(down): rev of D->H(up)
        cVV,
        pad(cDVr, ((0, 0), (1, 0))),          # V->D(left):  rev of D->V(right)
        pad(cHVu[:c, :], ((0, 0), (1, 0))),   # V->H(left):  rev of H->V(up)
        pad(cHVd[1:, :], ((0, 0), (0, 1))),   # V->H(right): rev of H->V(down)
        pad(cDVl, ((0, 0), (0, 1))),          # V->D(right): rev of D->V(left)
        cDD,
        cVDl[:, 1:],                          # D->V(right): rev of V->D(left)
        cHDu[:c, :],                          # D->H(down):  rev of H->D(up)
        cHDd[1:, :],                          # D->H(up):    rev of H->D(down)
        cVDr[:, :c],                          # D->V(left):  rev of V->D(right)
    )


def stencil_matvec(pattern: StencilPattern, coeffs: tuple, x_fam):
    """y = A @ x in family layout: 15 shift-multiply-adds, no gathers."""
    n, c = pattern.n, pattern.c
    nH, nV = n * c, c * n
    xH = x_fam[:nH].reshape(n, c)
    xV = x_fam[nH:nH + nV].reshape(c, n)
    xD = x_fam[nH + nV:].reshape(c, c)
    (cHH, cHVu, cHDu, cHVd, cHDd,
     cVV, cVDl, cVHl, cVHr, cVDr,
     cDD, cDVr, cDHd, cDHu, cDVl) = coeffs

    pad = jnp.pad
    yH = (cHH * xH
          + cHVu * pad(xV[:, 1:], ((0, 1), (0, 0)))
          + cHDu * pad(xD, ((0, 1), (0, 0)))
          + cHVd * pad(xV[:, :c], ((1, 0), (0, 0)))
          + cHDd * pad(xD, ((1, 0), (0, 0))))
    yV = (cVV * xV
          + cVDl * pad(xD, ((0, 0), (1, 0)))
          + cVHl * pad(xH[:c, :], ((0, 0), (1, 0)))
          + cVHr * pad(xH[1:, :], ((0, 0), (0, 1)))
          + cVDr * pad(xD, ((0, 0), (0, 1))))
    yD = (cDD * xD
          + cDVr * xV[:, 1:]
          + cDHd * xH[:c, :]
          + cDHu * xH[1:, :]
          + cDVl * xV[:, :c])
    return jnp.concatenate([yH.ravel(), yV.ravel(), yD.ravel()])


def get_pattern(mesh_data) -> StencilPattern:
    """Build (and cache on the MeshData instance) the stencil pattern."""
    pattern = getattr(mesh_data, "_stencil_pattern", None)
    if pattern is None:
        pattern = build_stencil_pattern(
            mesh_data._host_t2s, mesh_data._host_ell_cols,
            mesh_data.structured_n,
        )
        mesh_data._stencil_pattern = pattern
    return pattern


def family_view(mesh_data, pattern: StencilPattern = None, *, perm=None):
    """Static mesh-data stand-in with fields permuted to family layout,
    for running run_time_loop entirely in family order. Pass either a
    pattern or a bare ``perm`` array (the only field consumed).

    Carries enough geometry (permuted midpoints/lengths + the vertex
    coordinates, which only supply the box extent) for
    models/crbe.robin_terms to derive Robin side masks IN FAMILY ORDER —
    the per-DOF stencil coefficients already contain the assembled
    alpha * |e| diagonal, so the stencil scan path supports Robin walls
    exactly. The translation-invariant uniform/patch extractions do not
    (Robin breaks uniformity on boundary rows) and stay gated off."""
    if perm is None:
        perm = pattern.perm
    perm = jnp.asarray(perm)

    class _FamView:
        midpoints = mesh_data.midpoints[perm]
        boundary_mask = mesh_data.boundary_mask[perm]
        segment_lengths = mesh_data.segment_lengths[perm]
        points = mesh_data.points
        nt = mesh_data.nt

    return _FamView


def family_operators(pattern: StencilPattern, ops, order: int,
                     matvec_fn=None):
    """Traced pieces for a family-layout time loop: permuted diagonal
    operators plus stencil matvec closures (system, and K+A for
    Crank-Nicolson). ``ops`` is a crbe.GlobalOperators; ``matvec_fn``
    defaults to :func:`stencil_matvec` (pass the Pallas variant to use
    the kernel)."""
    import functools

    mv = matvec_fn or stencil_matvec
    perm = jnp.asarray(pattern.perm)
    coeffs = extract_coefficients(pattern, ops.system.vals)
    matvec = functools.partial(mv, pattern, coeffs)
    if order == 2:
        ka_coeffs = extract_coefficients(pattern, ops.ka.vals)
        ka_matvec = functools.partial(mv, pattern, ka_coeffs)
    else:
        ka_matvec = None
    ops_fam = ops._replace(
        mass_diag=ops.mass_diag[perm], system_diag=ops.system_diag[perm]
    )
    return ops_fam, matvec, ka_matvec
