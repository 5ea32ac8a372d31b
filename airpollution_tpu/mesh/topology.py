"""Vectorized mesh topology: edge (segment) enumeration and sparsity pattern.

The reference enumerates Crouzeix-Raviart DOFs (edge midpoints) with a Python
dict loop over triangles (crbe.py:109-131): per triangle, local edges in the
order ``[(v1, v2), (v2, v0), (v0, v1)]`` (crbe.py:117), normalized as sorted
vertex pairs, with global segment ids assigned in first-encounter order. That
loop is O(n_tri) Python and takes ~0.9 s at mesh size 128 (BASELINE.md).

This module reproduces the *exact same enumeration contract* — including the
dict-insertion id order — with vectorized numpy (and optionally the native C++
kernel in ``airpollution_tpu.mesh.native``), and additionally precomputes the
static sparsity structure (ELL layout) that the TPU assembly and SpMV paths
need. Everything here is host-side setup executed once per mesh; the outputs
are plain numpy arrays that ``MeshData`` places on device.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Local edge order within each triangle (opposite vertex 0, 1, 2), matching
# the reference contract at crbe.py:117 and the CR reference element's
# ``segment_enumeration`` (crbe.py:181-185).
_LOCAL_EDGES = np.array([[1, 2], [2, 0], [0, 1]], dtype=np.int64)


@dataclasses.dataclass(frozen=True)
class EdgeTopology:
    """Edge enumeration of a triangulation.

    Attributes:
      segments: (n_seg, 2) int32, vertex pairs (a < b), in first-encounter
        order over triangles x local edges — identical ids to the reference's
        ``MeshData._enumerate_segments`` (crbe.py:109-131).
      triangle_to_segments: (n_tri, 3) int32, global segment id of each local
        edge.
      boundary_segments: (n_bseg,) int32 ascending, segments referenced by
        exactly one triangle (crbe.py:77-80).
      boundary_triangles: (n_btri,) int32, triangles containing at least one
        boundary segment, in triangle order (crbe.py:86-95).
      boundary_triangle_first_segment: (n_btri,) int32, for each boundary
        triangle the *first* boundary segment in its local edge order —
        mirroring the reference's ``boundary_triangle_to_segments`` dict
        values (crbe.py:88-93).
    """

    segments: np.ndarray
    triangle_to_segments: np.ndarray
    boundary_segments: np.ndarray
    boundary_triangles: np.ndarray
    boundary_triangle_first_segment: np.ndarray


def enumerate_edges(triangles: np.ndarray, n_points: int) -> EdgeTopology:
    """Enumerate unique edges in reference (first-encounter) order.

    Vectorized equivalent of crbe.py:109-131: edges are keyed by the sorted
    vertex pair; ids are assigned in order of first appearance when scanning
    triangles sequentially and local edges in ``_LOCAL_EDGES`` order.
    """
    tris = np.asarray(triangles, dtype=np.int64)
    n_tri = tris.shape[0]

    native_result = None
    if n_tri >= 4096:  # native kernel pays off on large meshes
        from airpollution_tpu.mesh import native as native_mod

        native_result = native_mod.enumerate_edges_native(tris, n_points)

    if native_result is not None:
        segments, triangle_to_segments = native_result
        seg_ids = triangle_to_segments.reshape(-1).astype(np.int64)
    else:
        # Vectorized numpy fallback.
        # (n_tri, 3, 2): local edges in contract order, canonical (min, max).
        edges = tris[:, _LOCAL_EDGES]
        lo = edges.min(axis=2)
        hi = edges.max(axis=2)
        keys = (lo * n_points + hi).ravel()  # int64 key per undirected edge

        # First-encounter enumeration: np.unique gives sorted keys; remap
        # ranks so ids follow each key's first occurrence in `keys`.
        sorted_keys, first_idx, inverse = np.unique(
            keys, return_index=True, return_inverse=True
        )
        order = np.argsort(first_idx, kind="stable")
        rank_to_id = np.empty_like(order)
        rank_to_id[order] = np.arange(order.size)
        seg_ids = rank_to_id[inverse]

        first_sorted = np.sort(first_idx)
        seg_keys = keys[first_sorted]
        segments = np.stack(
            [seg_keys // n_points, seg_keys % n_points], axis=1
        ).astype(np.int32)
        triangle_to_segments = seg_ids.reshape(n_tri, 3).astype(np.int32)

    # Boundary segments: referenced by exactly one triangle (crbe.py:77-80).
    counts = np.bincount(seg_ids, minlength=segments.shape[0])
    boundary_segments = np.nonzero(counts == 1)[0].astype(np.int32)

    # Boundary triangles and their first boundary segment (crbe.py:86-95).
    is_bseg = counts == 1
    tri_bmask = is_bseg[triangle_to_segments]  # (n_tri, 3)
    has_b = tri_bmask.any(axis=1)
    boundary_triangles = np.nonzero(has_b)[0].astype(np.int32)
    first_local = np.argmax(tri_bmask[boundary_triangles], axis=1)
    boundary_triangle_first_segment = triangle_to_segments[
        boundary_triangles, first_local
    ].astype(np.int32)

    return EdgeTopology(
        segments=segments,
        triangle_to_segments=triangle_to_segments,
        boundary_segments=boundary_segments,
        boundary_triangles=boundary_triangles,
        boundary_triangle_first_segment=boundary_triangle_first_segment,
    )


@dataclasses.dataclass(frozen=True)
class EllPattern:
    """Static ELL sparsity pattern of the CR global operators.

    The three global matrices (mass, stiffness, advection; crbe.py:326-354)
    share one sparsity pattern: row i couples segment i with the edges of its
    (at most two) adjacent triangles, so every row has at most 5 nonzeros.
    A fixed-width ELL layout maps this onto dense (n_seg, width) arrays —
    static shapes, contiguous gathers, no per-step format conversion (the
    reference converts CSR -> LIL -> CSR every time step, crbe.py:397-404).

    Attributes:
      cols: (n_seg, width) int32 column index per slot; padding slots point at
        column 0 (their value is always 0, so the gather stays in-bounds and
        contributes nothing).
      entry_to_slot: (9 * n_tri,) int32 mapping each local-matrix entry
        (tri, a, b) — flattened in that order — to its flat slot id
        ``row * width + k``. Device-side assembly is a single segment_sum of
        the 9 * n_tri local values over this map.
      diag_slot: (n_seg,) int32 flat slot id of each row's diagonal entry.
      width: ELL width (5 for interior-edge rows of a triangular mesh).
    """

    cols: np.ndarray
    entry_to_slot: np.ndarray
    diag_slot: np.ndarray
    width: int


def build_ell_pattern(triangle_to_segments: np.ndarray, n_seg: int) -> EllPattern:
    """Precompute the ELL layout and the local-entry -> slot scatter map."""
    t2s = np.asarray(triangle_to_segments, dtype=np.int64)
    n_tri = t2s.shape[0]

    # All (row, col) pairs touched by assembly: (tri, a, b) in entry order.
    rows = np.repeat(t2s, 3, axis=1).reshape(n_tri, 3, 3)  # rows[t, a, b]
    cols = np.stack([t2s] * 3, axis=1)  # cols[t, a, b] = t2s[t, b]
    pair_keys = (rows * n_seg + cols).ravel()

    uniq, inverse = np.unique(pair_keys, return_inverse=True)
    uniq_rows = uniq // n_seg
    uniq_cols = uniq % n_seg

    # Per-row slot position: uniq is sorted by (row, col), so slot k is the
    # rank of the entry within its row.
    row_starts = np.searchsorted(uniq_rows, np.arange(n_seg))
    k_within_row = np.arange(uniq.size) - row_starts[uniq_rows]
    width = int(k_within_row.max()) + 1 if uniq.size else 0

    ell_cols = np.zeros((n_seg, width), dtype=np.int32)
    ell_cols[uniq_rows, k_within_row] = uniq_cols

    slot_of_uniq = (uniq_rows * width + k_within_row).astype(np.int32)
    entry_to_slot = slot_of_uniq[inverse]

    diag_rank = np.searchsorted(uniq, np.arange(n_seg) * (n_seg + 1))
    if not np.array_equal(uniq[diag_rank], np.arange(n_seg) * (n_seg + 1)):
        raise ValueError("every row must have a diagonal entry")
    diag_slot = slot_of_uniq[diag_rank]

    return EllPattern(
        cols=ell_cols,
        entry_to_slot=entry_to_slot.astype(np.int32),
        diag_slot=diag_slot.astype(np.int32),
        width=width,
    )
