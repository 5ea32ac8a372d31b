"""Structured triangulation of the square domain (gmsh replacement).

The reference meshes the box with the gmsh C++ kernel through its Python API
(crbe.py:14-44): an OCC rectangle at (-L, -L) of size 2L x 2L with
characteristic length ``2L / (n_points_per_axis - 1)``, written to a ``.msh``
file and read back with meshio (crbe.py:676). That pipeline is a host-side,
file-round-trip process boundary.

Here the mesh is produced directly as arrays: a regular n x n grid of
vertices on [-L, L]^2, each grid cell split into two triangles along the
(v00, v11) diagonal. The vertex spacing equals gmsh's characteristic length,
so mesh sizes are comparable h-for-h with the reference sweeps
(crbe_experiments.py:27, mesh_sizes = [4, 8, 16, 32, 64, 128]). No file I/O,
no external process, and topology generation is vectorized numpy (with an
optional native C++ kernel, see airpollution_tpu.mesh.native).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Mesh:
    """A triangulation: vertex coordinates and triangle connectivity.

    Stand-in for the meshio object the reference passes to ``MeshData``
    (crbe.py:50): only ``points`` (N, 2) float64 and ``triangles`` (T, 3)
    int32 are carried, as plain numpy arrays (mesh construction is host-side
    setup; device arrays are created by ``MeshData``).

    ``n_points_per_axis`` is set for meshes produced by :func:`create_mesh`
    (None for externally supplied triangulations); it unlocks the
    structured-stencil SpMV fast path (airpollution_tpu.ops.stencil).

    ``mirror`` is set by :func:`airpollution_tpu.mesh.msh_io.read_msh`
    when the source grid matched the canonical triangulation only after
    a coordinate reflection ``sigma = diag(sx, sy)`` (a regular grid cut
    along the OTHER cell diagonal): this canonical mesh is the
    sigma-image of the file's triangulation, and solving on it requires
    the flip-solve-flip pullback — see airpollution_tpu.mesh.mirror.
    ``None`` for everything else (no transform needed).
    """

    points: np.ndarray
    triangles: np.ndarray
    n_points_per_axis: int | None = None
    mirror: tuple[int, int] | None = None


def create_unstructured_mesh(n_points_per_axis: int = 20,
                             domain_size: float = 2.0,
                             jitter: float = 0.3,
                             seed: int = 0) -> Mesh:
    """Unstructured triangulation of the box (gmsh-like geometry).

    The reference's gmsh meshes are unstructured Delaunay triangulations
    (crbe.py:37); this produces a comparable mesh without the C++ CAD
    kernel: grid points with interior nodes jittered by ``jitter * h``,
    Delaunay-triangulated (scipy.spatial), triangles oriented CCW. The
    stencil fast path does not apply (``n_points_per_axis`` is left None);
    the solver automatically uses the general ELL SpMV path.
    """
    from scipy.spatial import Delaunay

    base = create_mesh(n_points_per_axis, domain_size)
    pts = base.points.copy()
    n = int(n_points_per_axis)
    L = float(domain_size)
    h = 2 * L / (n - 1)
    rng = np.random.default_rng(seed)
    interior = (
        (np.abs(pts[:, 0]) < L - 1e-12) & (np.abs(pts[:, 1]) < L - 1e-12)
    )
    pts[interior] += rng.uniform(-jitter * h, jitter * h,
                                 size=(int(interior.sum()), 2))

    tri = Delaunay(pts)
    triangles = tri.simplices.astype(np.int32)
    # Enforce CCW orientation (scipy does not guarantee it).
    p0, p1, p2 = (pts[triangles[:, 0]], pts[triangles[:, 1]],
                  pts[triangles[:, 2]])
    signed = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (
        p2[:, 0] - p0[:, 0]
    ) * (p1[:, 1] - p0[:, 1])
    flip = signed < 0
    triangles[flip, 1], triangles[flip, 2] = (
        triangles[flip, 2].copy(), triangles[flip, 1].copy()
    )
    return Mesh(points=pts, triangles=triangles, n_points_per_axis=None)


def create_mesh(n_points_per_axis: int = 20, domain_size: float = 2.0) -> Mesh:
    """Triangulate [-domain_size, domain_size]^2 with a structured grid.

    Counterpart of ``create_mesh`` (crbe.py:14-44) minus gmsh: n points per
    axis, spacing ``2 * domain_size / (n - 1)`` (same as gmsh's
    CharacteristicLengthMin/Max at crbe.py:32-34). Each of the (n-1)^2 cells
    is split into two counter-clockwise triangles along its main diagonal:

        v01 --- v11        tri A: (v00, v10, v11)
         |  B  / |         tri B: (v00, v11, v01)
         |   /   |
         | /  A  |
        v00 --- v10

    Returns a :class:`Mesh` with float64 points and int32 triangles.
    """
    n = int(n_points_per_axis)
    if n < 2:
        raise ValueError("n_points_per_axis must be >= 2")
    L = float(domain_size)

    axis = np.linspace(-L, L, n)
    xx, yy = np.meshgrid(axis, axis, indexing="xy")
    points = np.stack([xx.ravel(), yy.ravel()], axis=1)  # row-major: iy*n+ix

    ix = np.arange(n - 1)
    iy = np.arange(n - 1)
    gx, gy = np.meshgrid(ix, iy, indexing="xy")
    v00 = (gy * n + gx).ravel()
    v10 = v00 + 1
    v01 = v00 + n
    v11 = v01 + 1

    tri_a = np.stack([v00, v10, v11], axis=1)
    tri_b = np.stack([v00, v11, v01], axis=1)
    # Interleave A, B per cell so triangle order follows cell order.
    triangles = np.empty((2 * tri_a.shape[0], 3), dtype=np.int32)
    triangles[0::2] = tri_a
    triangles[1::2] = tri_b

    return Mesh(points=points, triangles=triangles, n_points_per_axis=n)
