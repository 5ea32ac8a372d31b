"""Gmsh ``.msh`` file ingestion and export (meshio replacement).

The reference consumes gmsh meshes through meshio (``meshio.read`` at
crbe.py:676, after its gmsh-kernel ``create_mesh`` writes one at
crbe.py:14-44) — a user with a real surveyed/graded ``.msh`` mesh feeds
it straight into ``MeshData``. This module restores that capability
without meshio or the gmsh kernel: a small pure-python parser for the
two ASCII formats gmsh actually writes (legacy 2.2 and current 4.x),
returning the same :class:`~airpollution_tpu.mesh.structured.Mesh`
array container every other mesh source produces, plus a 4.1 writer for
the round trip.

Scope: 2D triangulations (element type 2, the only element the CR
discretization consumes). Nodes of any dimension are accepted (the z
coordinate is dropped, as meshio-backed ``MeshData`` did); points,
lines, quads etc. in the file are skipped. Binary ``.msh`` is refused
with a pointer to ``gmsh -save -format msh2`` / ASCII export.
"""

from __future__ import annotations

import numpy as np

from airpollution_tpu.mesh.structured import Mesh

__all__ = ["read_msh", "write_msh"]

_TRIANGLE = 2  # gmsh element type: 3-node triangle


def _orient_ccw(points: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Flip negatively-oriented triangles in place (CCW convention —
    the assembly's Jacobians assume positive signed areas, like the
    meshes from create_mesh/create_unstructured_mesh)."""
    p0 = points[triangles[:, 0]]
    p1 = points[triangles[:, 1]]
    p2 = points[triangles[:, 2]]
    signed = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (
        p2[:, 0] - p0[:, 0]
    ) * (p1[:, 1] - p0[:, 1])
    flip = signed < 0
    triangles[flip, 1], triangles[flip, 2] = (
        triangles[flip, 2].copy(), triangles[flip, 1].copy()
    )
    return triangles


def _blocks(lines: list[str]) -> dict[str, list[str]]:
    """Split a .msh file into its $Section blocks (content lines only)."""
    out: dict[str, list[str]] = {}
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("$") and not line.startswith("$End"):
            name = line[1:]
            end = f"$End{name}"
            j = i + 1
            body = []
            while j < len(lines) and lines[j].strip() != end:
                body.append(lines[j].strip())
                j += 1
            if j >= len(lines):
                raise ValueError(f"unterminated ${name} section")
            out[name] = body
            i = j + 1
        else:
            i += 1
    return out


def _parse_v2(blocks: dict[str, list[str]]) -> tuple[np.ndarray, np.ndarray]:
    """Legacy MSH 2.2 ASCII: flat node/element lists with explicit tags."""
    nodes = blocks["Nodes"]
    n_nodes = int(nodes[0])
    tags = np.empty(n_nodes, dtype=np.int64)
    pts = np.empty((n_nodes, 2), dtype=np.float64)
    for k, line in enumerate(nodes[1:1 + n_nodes]):
        parts = line.split()
        tags[k] = int(parts[0])
        pts[k, 0] = float(parts[1])
        pts[k, 1] = float(parts[2])
    index = {int(t): i for i, t in enumerate(tags)}

    elems = blocks["Elements"]
    n_elems = int(elems[0])
    tris = []
    for line in elems[1:1 + n_elems]:
        parts = line.split()
        etype = int(parts[1])
        if etype != _TRIANGLE:
            continue
        n_etags = int(parts[2])
        conn = parts[3 + n_etags:3 + n_etags + 3]
        tris.append([index[int(c)] for c in conn])
    return pts, np.asarray(tris, dtype=np.int32).reshape(-1, 3)


def _parse_v4(blocks: dict[str, list[str]],
              v40: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """MSH 4.x ASCII: entity-blocked nodes and elements. 4.1 stores a
    block's node tags first and coordinates after; 4.0 stores
    ``tag x y z`` per line (``v40``)."""
    nodes = blocks["Nodes"]
    n_blocks, n_nodes = (int(x) for x in nodes[0].split()[:2])
    tags = np.empty(n_nodes, dtype=np.int64)
    pts = np.empty((n_nodes, 2), dtype=np.float64)
    pos = 1
    k = 0
    for _ in range(n_blocks):
        n_in = int(nodes[pos].split()[3])
        pos += 1
        if v40:
            for b in range(n_in):
                parts = nodes[pos + b].split()
                tags[k + b] = int(parts[0])
                pts[k + b, 0] = float(parts[1])
                pts[k + b, 1] = float(parts[2])
            pos += n_in
        else:
            for b in range(n_in):
                tags[k + b] = int(nodes[pos + b])
            for b in range(n_in):
                parts = nodes[pos + n_in + b].split()
                pts[k + b, 0] = float(parts[0])
                pts[k + b, 1] = float(parts[1])
            pos += 2 * n_in
        k += n_in
    index = {int(t): i for i, t in enumerate(tags)}

    elems = blocks["Elements"]
    n_blocks = int(elems[0].split()[0])
    pos = 1
    tris = []
    for _ in range(n_blocks):
        hdr = elems[pos].split()
        etype, n_in = int(hdr[2]), int(hdr[3])
        pos += 1
        if etype == _TRIANGLE:
            for line in elems[pos:pos + n_in]:
                parts = line.split()
                tris.append([index[int(c)] for c in parts[1:4]])
        pos += n_in
    return pts, np.asarray(tris, dtype=np.int32).reshape(-1, 3)


def read_msh(path: str) -> Mesh:
    """Read a gmsh ASCII ``.msh`` file (2.2 or 4.x) into a :class:`Mesh`.

    Returns the same array container ``create_mesh`` produces
    (``n_points_per_axis=None`` — an external mesh gets the general ELL
    SpMV path, not the structured stencil fast path). Triangles are
    reoriented CCW; non-triangle elements are skipped; unreferenced
    nodes are kept (they become hanging vertices with no DOFs — the CR
    DOFs live on edges of actual triangles).
    """
    with open(path) as f:
        raw = f.read()
    if "\x00" in raw[:256]:
        raise ValueError(
            f"{path}: binary .msh is not supported — re-export ASCII "
            f"(gmsh: File > Export with ASCII checked, or "
            f"`gmsh in.msh -save -format msh2`)"
        )
    blocks = _blocks(raw.splitlines())
    if "MeshFormat" not in blocks:
        raise ValueError(f"{path}: missing $MeshFormat — not a .msh file")
    fmt = blocks["MeshFormat"][0].split()
    version = float(fmt[0])
    if len(fmt) > 1 and int(fmt[1]) != 0:
        raise ValueError(
            f"{path}: binary .msh (file-type {fmt[1]}) is not supported "
            f"— re-export ASCII"
        )
    if "Nodes" not in blocks or "Elements" not in blocks:
        raise ValueError(f"{path}: missing $Nodes/$Elements section")
    try:
        if version >= 4.0:
            # 4.0 and 4.1 differ in the $Nodes block layout (4.0: one
            # 'tag x y z' line per node; 4.1: tags first, coords after).
            pts, tris = _parse_v4(blocks, v40=version < 4.1)
        elif version >= 2.0:
            pts, tris = _parse_v2(blocks)
        else:
            raise ValueError(f"{path}: unsupported .msh version {version}")
    except KeyError as e:
        # A triangle references a node tag absent from $Nodes — surface
        # it as a file-format error, not a raw dict lookup failure.
        raise ValueError(
            f"{path}: element references undefined node tag {e.args[0]}"
        ) from None
    if tris.shape[0] == 0:
        raise ValueError(f"{path}: no 3-node triangles in $Elements")
    return Mesh(points=pts, triangles=_orient_ccw(pts, tris),
                n_points_per_axis=None)


def write_msh(mesh: Mesh, path: str) -> str:
    """Write a :class:`Mesh` as gmsh 4.1 ASCII (one surface entity).

    Round-trips through :func:`read_msh` preserving node/triangle order,
    and loads in gmsh/meshio — the export half of the reference's
    file-based mesh pipeline (crbe.py:41 ``gmsh.write``).
    """
    pts = np.asarray(mesh.points, dtype=np.float64)
    tris = np.asarray(mesh.triangles, dtype=np.int64)
    n, t = len(pts), len(tris)
    lines = [
        "$MeshFormat", "4.1 0 8", "$EndMeshFormat",
        # One surface entity, TAG 1 (the tag the $Nodes/$Elements
        # blocks reference below): tag, 6 bbox coords, 0 physical
        # tags, 0 bounding curves.
        "$Entities", "0 0 1 0", "1 0 0 0 0 0 0 0 0", "$EndEntities",
        "$Nodes", f"1 {n} 1 {n}", f"2 1 0 {n}",
    ]
    lines += [str(i + 1) for i in range(n)]
    lines += [f"{x:.17g} {y:.17g} 0" for x, y in pts]
    lines += ["$EndNodes", "$Elements", f"1 {t} 1 {t}",
              f"2 1 {_TRIANGLE} {t}"]
    lines += [f"{i + 1} {a + 1} {b + 1} {c + 1}"
              for i, (a, b, c) in enumerate(tris)]
    lines += ["$EndElements", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path
