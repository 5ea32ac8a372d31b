"""Tests for pure-JAX Latin Hypercube sampling (pyDOE replacement)."""

import numpy as np
import jax

from airpollution_tpu.ops import sampling


def test_lhs_stratification():
    """Exactly one sample per stratum per axis — the LHS property."""
    key = jax.random.PRNGKey(0)
    n = 64
    u = np.asarray(sampling.lhs_unit(key, n, 3))
    assert u.shape == (n, 3)
    for d in range(3):
        strata = np.floor(u[:, d] * n).astype(int)
        assert sorted(strata.tolist()) == list(range(n))


def test_lhs_sampling_ranges():
    key = jax.random.PRNGKey(1)
    xy = np.asarray(sampling.lhs_sampling(key, 100, (-20, 20, -5, 5)))
    assert xy.shape == (100, 2)
    assert xy[:, 0].min() >= -20 and xy[:, 0].max() <= 20
    assert xy[:, 1].min() >= -5 and xy[:, 1].max() <= 5

    xyt = np.asarray(
        sampling.lhs_sampling(key, 100, (-20, 20, -5, 5), (0.0, 10.0))
    )
    assert xyt.shape == (100, 3)
    assert xyt[:, 2].min() >= 0 and xyt[:, 2].max() <= 10


def test_boundary_sampler_sides_and_counts():
    """4 * (n // 4) points, in side order left/right/bottom/top
    (pinn.py:492-528)."""
    key = jax.random.PRNGKey(2)
    n = 103  # non-multiple of 4: truncation like the reference
    pts = np.asarray(
        sampling.sample_boundary_points(key, n, (-20, 20, -20, 20), (0, 10))
    )
    n_side = n // 4
    assert pts.shape == (4 * n_side, 3)
    assert np.all(pts[:n_side, 0] == -20)
    assert np.all(pts[n_side : 2 * n_side, 0] == 20)
    assert np.all(pts[2 * n_side : 3 * n_side, 1] == -20)
    assert np.all(pts[3 * n_side :, 1] == 20)
    assert pts[:, 2].min() >= 0 and pts[:, 2].max() <= 10
    # Every point is on the boundary.
    on_b = (np.abs(pts[:, 0]) == 20) | (np.abs(pts[:, 1]) == 20)
    assert on_b.all()


def test_keys_give_different_samples():
    a = np.asarray(sampling.lhs_sampling(jax.random.PRNGKey(0), 50, (-1, 1, -1, 1)))
    b = np.asarray(sampling.lhs_sampling(jax.random.PRNGKey(1), 50, (-1, 1, -1, 1)))
    assert not np.allclose(a, b)
