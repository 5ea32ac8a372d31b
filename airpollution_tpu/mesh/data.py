"""MeshData: device-resident mesh geometry, topology and sparsity pattern.

TPU-native counterpart of the reference's ``MeshData`` (crbe.py:47-164). The
reference computes midpoints, segment lengths, triangle areas, boundary sets
and the mesh diameter with Python loops over triangles/segments
(crbe.py:97-154, ~0.9 s at mesh size 128 per BASELINE.md); here all geometry
is vectorized and the results live on device as JAX arrays with static
shapes, ready for jitted assembly and time stepping.

Field-for-field parity with the reference object (names kept identical so the
experiment drivers read the same attributes):
  points, number_of_points          crbe.py:59-60
  triangles, number_of_triangles    crbe.py:63-64
  segments, triangle_to_segments    crbe.py:67 (order contract: topology.py)
  number_of_segments                crbe.py:68
  midpoints                         crbe.py:71
  segment_lengths, triangle_areas   crbe.py:74-75
  boundary_segments                 crbe.py:77-80
  boundary_triangles                crbe.py:82-95
  diameter                          crbe.py:97-106 (max edge length)
  time_discr = linspace(0, T, nt)   crbe.py:56

TPU additions: ``boundary_mask`` (dense bool mask over segments, used for
Dirichlet row masking instead of per-step sparse surgery, crbe.py:397-404)
and ``ell`` (the static ELL sparsity pattern for assembly/SpMV).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from airpollution_tpu.mesh import topology as topo_mod
from airpollution_tpu.mesh.structured import Mesh


class MeshData:
    """Mesh geometry + CR DOF topology as device arrays."""

    def __init__(self, mesh: Mesh, domain, nt: int, dtype=jnp.float32,
                 mirror_ok: bool = False):
        if getattr(mesh, "mirror", None) and not mirror_ok:
            # A mirror-tagged mesh (read_msh on a grid cut along the
            # OTHER cell diagonal) is the sigma-IMAGE of the file's
            # triangulation: solving a problem on it directly computes
            # the reflected problem — silently wrong for any asymmetric
            # wind/source. The flip-solve-flip contract
            # (airpollution_tpu.mesh.mirror: wrap the problem with
            # mirror_problem, map fields back with mirror_field) must be
            # acknowledged explicitly; the CLI does this automatically.
            raise ValueError(
                f"mesh carries mirror={mesh.mirror}: it is the "
                f"reflection of the source grid, and solving on it "
                f"needs the pullback problem + output permutation "
                f"(airpollution_tpu.mesh.mirror.mirror_problem / "
                f"mirror_field). Pass mirror_ok=True after wrapping "
                f"the problem, or re-read with "
                f"read_msh(path, structured=False) for the exact "
                f"general-path solve on the file's own triangulation"
            )
        self.mesh = mesh
        self.domain = domain
        self.nt = int(nt)
        self.dtype = dtype

        pts = np.asarray(mesh.points, dtype=np.float64)[:, :2]
        tris = np.asarray(mesh.triangles, dtype=np.int32)

        topo = topo_mod.enumerate_edges(tris, n_points=pts.shape[0])
        segs = topo.segments

        # --- geometry (vectorized, float64 on host, cast on device) ---
        midpoints = 0.5 * (pts[segs[:, 0]] + pts[segs[:, 1]])
        seg_vec = pts[segs[:, 0]] - pts[segs[:, 1]]
        seg_lengths = np.linalg.norm(seg_vec, axis=1)

        p0, p1, p2 = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
        cross = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (
            p2[:, 0] - p0[:, 0]
        ) * (p1[:, 1] - p0[:, 1])
        areas = 0.5 * np.abs(cross)

        edge_len = np.stack(
            [
                np.linalg.norm(p0 - p1, axis=1),
                np.linalg.norm(p1 - p2, axis=1),
                np.linalg.norm(p2 - p0, axis=1),
            ],
            axis=1,
        )
        diameter = float(edge_len.max()) if edge_len.size else 0.0

        # --- publish: device arrays ---
        self.points = jnp.asarray(pts, dtype=dtype)
        self.number_of_points = pts.shape[0]
        self.triangles = jnp.asarray(tris)
        self.number_of_triangles = tris.shape[0]
        self.segments = jnp.asarray(segs)
        self.triangle_to_segments = jnp.asarray(topo.triangle_to_segments)
        self.number_of_segments = segs.shape[0]
        self.midpoints = jnp.asarray(midpoints, dtype=dtype)
        self.segment_lengths = jnp.asarray(seg_lengths, dtype=dtype)
        self.triangle_areas = jnp.asarray(areas, dtype=dtype)
        self.boundary_segments = jnp.asarray(topo.boundary_segments)
        self.boundary_triangles = jnp.asarray(topo.boundary_triangles)
        self.boundary_triangle_first_segment = jnp.asarray(
            topo.boundary_triangle_first_segment
        )
        self.diameter = diameter
        self.time_discr = jnp.linspace(0.0, float(domain.T), self.nt, dtype=dtype)

        bmask = np.zeros(segs.shape[0], dtype=bool)
        bmask[topo.boundary_segments] = True
        self.boundary_mask = jnp.asarray(bmask)

        # Structured-mesh metadata (enables the stencil SpMV fast path) and
        # host copies of the topology for stencil pattern construction.
        self.structured_n = getattr(mesh, "n_points_per_axis", None)
        self._host_t2s = topo.triangle_to_segments
        self._ell_pattern = None

    # --- ELL sparsity pattern (lazy): only the global-assembly paths need
    # it; patch-assembled solves (models/crbe.py assembly='patch') never
    # touch it, and at 2049^2+ the device arrays alone are multiple GB. ---

    def _ensure_ell(self):
        # Cache HOST arrays only: the first access may happen inside a
        # jit/vmap trace (the vmapped sweeps assemble under vmap), where
        # jnp.asarray returns trace-local constants that must not leak
        # into the cache. The per-access conversion folds to a constant
        # under jit and is a one-time transfer eagerly.
        if self._ell_pattern is None:
            self._ell_pattern = topo_mod.build_ell_pattern(
                self._host_t2s, n_seg=self.number_of_segments
            )
        return self._ell_pattern

    @property
    def ell_cols(self):
        return jnp.asarray(self._ensure_ell().cols)

    @property
    def ell_entry_to_slot(self):
        return jnp.asarray(self._ensure_ell().entry_to_slot)

    @property
    def ell_diag_slot(self):
        return jnp.asarray(self._ensure_ell().diag_slot)

    @property
    def ell_width(self):
        return self._ensure_ell().width

    @property
    def _host_ell_cols(self):
        return self._ensure_ell().cols

    def show(self, filename="mesh_visualition.pdf"):
        """Visualize the triangulation (crbe.py:156-164; the reference's
        output filename typo is kept as the default)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pts = np.asarray(self.points)
        plt.figure(figsize=(10, 8))
        plt.triplot(pts[:, 0], pts[:, 1], np.asarray(self.triangles))
        plt.axis("equal")
        plt.grid(False)
        plt.title("2D Mesh Visualization")
        plt.savefig(filename, dpi=300)
        plt.close()


def boundary_side_masks(mesh_data):
    """Per-side boolean masks over segment DOFs of the box boundary.

    Returns ``{'left', 'right', 'bottom', 'top'} -> (n_seg,) bool`` where
    a mask is True for boundary edges lying on that side (their midpoints
    sit exactly on it — boundary edges run along the box walls). The wall
    coordinates are taken from the ACTUAL mesh extent (min/max of the
    vertex coordinates), not from the Domain, mirroring the patch-
    constants convention (models/crbe.CRBESolver._patch_pieces); the
    isclose atol matches Domain.is_boundary (utils/common.py:87-97).
    Mesh views without geometry (family-layout views) raise.
    """
    md = mesh_data
    if not hasattr(md, "points") or not hasattr(md, "boundary_mask"):
        raise ValueError(
            "boundary_side_masks needs geometry (points/midpoints/"
            "boundary_mask) — this mesh view carries none; Robin "
            "boundaries run on the per-DOF solve paths only"
        )
    # Pure jnp: views may be constructed INSIDE a jit trace (the inverse
    # fits build the family view per traced step), where a numpy
    # conversion of the permuted midpoints would fail. On concrete
    # inputs everything folds to constants.
    # No f64 cast: wall midpoints equal the wall coordinate EXACTLY in
    # the mesh's own dtype (both edge endpoints sit on the wall, and the
    # mean of equal values is exact), and requesting f64 without x64
    # enabled would warn/downcast on TPU runs.
    pts = jnp.asarray(md.points)
    mid = jnp.asarray(md.midpoints)
    bmask = jnp.asarray(md.boundary_mask)
    xmin, xmax = pts[:, 0].min(), pts[:, 0].max()
    ymin, ymax = pts[:, 1].min(), pts[:, 1].max()

    def on(coord, wall):
        return bmask & jnp.isclose(coord, wall, rtol=0.0, atol=1e-10)

    return {
        "left": on(mid[:, 0], xmin),
        "right": on(mid[:, 0], xmax),
        "bottom": on(mid[:, 1], ymin),
        "top": on(mid[:, 1], ymax),
    }


def structured_grid(mesh_data):
    """(xmin, ymin, h) of the structured vertex grid, as host floats.

    The three scalars the fused Pallas kernels use to rebuild family
    midpoint coordinates from iotas for in-kernel source evaluation
    (ops/pallas_solver, ops/pallas_hbm) — shared by the serial solve
    routing (models/crbe) and both distributed stripe builders
    (parallel/hbm_shard) so the coordinate convention cannot drift
    between paths."""
    import numpy as np

    if getattr(mesh_data, "structured_n", None) is None:
        raise ValueError("structured_grid requires a structured mesh")
    pts = np.asarray(mesh_data.points)
    xmin = float(pts[:, 0].min())
    h = (float(pts[:, 0].max()) - xmin) / (mesh_data.structured_n - 1)
    return xmin, float(pts[:, 1].min()), h
