"""Tests for the mesh layer: triangulation, edge-order contract, ELL pattern."""

import numpy as np
import pytest

from airpollution_tpu.mesh import (
    MeshData,
    build_ell_pattern,
    create_mesh,
    enumerate_edges,
)
from airpollution_tpu.problems import Domain


def _reference_edge_enumeration(triangles):
    """Oracle: the documented dict-insertion enumeration contract
    (crbe.py:109-131), executed literally on a small mesh."""
    segment_map = {}
    triangle_to_segments = []
    for tri in triangles:
        tri_segments = []
        for a, b in [(tri[1], tri[2]), (tri[2], tri[0]), (tri[0], tri[1])]:
            edge = tuple(sorted((int(a), int(b))))
            if edge not in segment_map:
                segment_map[edge] = len(segment_map)
            tri_segments.append(segment_map[edge])
        triangle_to_segments.append(tri_segments)
    segments = np.array(list(segment_map.keys()), dtype=np.int32)
    return segments, np.array(triangle_to_segments, dtype=np.int32)


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_edge_enumeration_matches_reference_contract(n):
    mesh = create_mesh(n, domain_size=1.0)
    topo = enumerate_edges(mesh.triangles, n_points=len(mesh.points))
    ref_segs, ref_t2s = _reference_edge_enumeration(mesh.triangles)
    np.testing.assert_array_equal(topo.segments, ref_segs)
    np.testing.assert_array_equal(topo.triangle_to_segments, ref_t2s)


def test_counts_and_geometry():
    n, L = 5, 2.0
    mesh = create_mesh(n, domain_size=L)
    domain = Domain(Lx=L, Ly=L, T=1.0)
    md = MeshData(mesh, domain, nt=4, dtype=np.float64)

    n_cells = (n - 1) ** 2
    assert md.number_of_points == n * n
    assert md.number_of_triangles == 2 * n_cells
    # Euler: edges = 3*cells + 2*(n-1) grid lines in each direction
    assert md.number_of_segments == 3 * n_cells + 2 * (n - 1)
    # Total area is the box area.
    assert np.isclose(np.sum(np.asarray(md.triangle_areas)), (2 * L) ** 2)
    # Diameter is the cell diagonal.
    h = 2 * L / (n - 1)
    assert np.isclose(md.diameter, h * np.sqrt(2))
    # Midpoints are the averages of segment endpoints.
    pts = np.asarray(md.points)
    segs = np.asarray(md.segments)
    np.testing.assert_allclose(
        np.asarray(md.midpoints), 0.5 * (pts[segs[:, 0]] + pts[segs[:, 1]])
    )
    # Boundary segment count: 4 sides x (n-1) edges.
    assert len(np.asarray(md.boundary_segments)) == 4 * (n - 1)
    # Boundary segments really lie on the boundary.
    bmid = np.asarray(md.midpoints)[np.asarray(md.boundary_segments)]
    on_b = np.asarray(domain.is_boundary(bmid))
    assert on_b.all()
    # Mask agrees with the index list.
    mask = np.asarray(md.boundary_mask)
    assert set(np.nonzero(mask)[0]) == set(np.asarray(md.boundary_segments))


def test_boundary_triangles_match_reference_semantics():
    mesh = create_mesh(4, domain_size=1.0)
    topo = enumerate_edges(mesh.triangles, n_points=len(mesh.points))
    bset = set(topo.boundary_segments.tolist())
    # Oracle: literal loop over triangles (crbe.py:86-95).
    expect_tris, expect_first = [], []
    for idx, tri_segs in enumerate(topo.triangle_to_segments):
        for seg in tri_segs:
            if int(seg) in bset:
                expect_tris.append(idx)
                expect_first.append(int(seg))
                break
    np.testing.assert_array_equal(topo.boundary_triangles, expect_tris)
    np.testing.assert_array_equal(
        topo.boundary_triangle_first_segment, expect_first
    )


def test_ell_pattern_reconstructs_dense_assembly():
    rng = np.random.default_rng(42)
    mesh = create_mesh(4, domain_size=1.0)
    topo = enumerate_edges(mesh.triangles, n_points=len(mesh.points))
    t2s = topo.triangle_to_segments
    n_seg = topo.segments.shape[0]
    ell = build_ell_pattern(t2s, n_seg)
    assert ell.width == 5

    local = rng.normal(size=(t2s.shape[0], 3, 3))
    # Dense oracle assembly.
    dense = np.zeros((n_seg, n_seg))
    for t in range(t2s.shape[0]):
        for a in range(3):
            for b in range(3):
                dense[t2s[t, a], t2s[t, b]] += local[t, a, b]
    # ELL assembly via the scatter map.
    vals = np.zeros(n_seg * ell.width)
    np.add.at(vals, ell.entry_to_slot, local.ravel())
    vals = vals.reshape(n_seg, ell.width)
    recon = np.zeros((n_seg, n_seg))
    for r in range(n_seg):
        for k in range(ell.width):
            recon[r, ell.cols[r, k]] += vals[r, k]
    np.testing.assert_allclose(recon, dense, atol=1e-12)
    # Diagonal slots point at the diagonal.
    rows = ell.diag_slot // ell.width
    ks = ell.diag_slot % ell.width
    np.testing.assert_array_equal(rows, np.arange(n_seg))
    np.testing.assert_array_equal(ell.cols[rows, ks], np.arange(n_seg))


def test_unstructured_mesh_solve():
    """Jittered-Delaunay (gmsh-like) meshes work through the general ELL
    path: geometry is consistent and the FEM solve converges on the
    Gaussian problem."""
    import jax.numpy as jnp
    from airpollution_tpu.mesh import create_unstructured_mesh
    from airpollution_tpu.models.crbe import CRBESolver
    from airpollution_tpu.problems import Problem

    mesh = create_unstructured_mesh(16, 20.0, seed=3)
    assert mesh.n_points_per_axis is None
    domain = Domain()
    md = MeshData(mesh, domain, nt=64, dtype=jnp.float64)
    # Areas tile the box exactly (Delaunay covers the convex hull = box).
    assert np.isclose(np.sum(np.asarray(md.triangle_areas)), 40.0 * 40.0)
    solver = CRBESolver(domain, Problem(), md, solver_tol=1e-10)
    assert not solver._use_stencil()
    solver.solve()
    rel_l2, _, mx = solver.compute_errors(Problem().analytical_solution)
    # Comparable accuracy to the structured ms=16 mesh (~1.0 rel-L2).
    assert rel_l2 < 2.0 and mx < 0.1
