"""Mesh layer: structured triangulation, edge topology, device MeshData."""

from airpollution_tpu.mesh.structured import Mesh, create_mesh, create_unstructured_mesh
from airpollution_tpu.mesh.topology import (
    EdgeTopology,
    EllPattern,
    build_ell_pattern,
    enumerate_edges,
)
from airpollution_tpu.mesh.data import MeshData
from airpollution_tpu.mesh.msh_io import read_msh, write_msh

__all__ = [
    "Mesh",
    "create_unstructured_mesh",
    "create_mesh",
    "EdgeTopology",
    "EllPattern",
    "build_ell_pattern",
    "enumerate_edges",
    "MeshData",
    "read_msh",
    "write_msh",
]
