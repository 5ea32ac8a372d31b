"""Tests for the native C++ mesh-topology kernel (ctypes bridge)."""

import numpy as np
import pytest

from airpollution_tpu.mesh import create_mesh
from airpollution_tpu.mesh import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.mark.parametrize("n", [3, 17, 64])
def test_native_matches_numpy_contract(n):
    """The C++ kernel reproduces the numpy (and reference) enumeration
    exactly: same ids, same order, same segments."""
    from airpollution_tpu.mesh import topology

    mesh = create_mesh(n, 2.0)
    expected = topology.enumerate_edges(mesh.triangles, len(mesh.points))
    got = native.enumerate_edges_native(
        np.asarray(mesh.triangles), len(mesh.points)
    )
    assert got is not None
    segments, t2s = got
    np.testing.assert_array_equal(segments, expected.segments)
    np.testing.assert_array_equal(t2s, expected.triangle_to_segments)


def test_native_rejects_bad_vertex_ids():
    bad = np.array([[0, 1, 99]], dtype=np.int32)
    with pytest.raises(ValueError):
        native.enumerate_edges_native(bad, n_points=3)
