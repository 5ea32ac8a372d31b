"""Tests for the problems layer (parity with utils/common.py semantics)."""

import numpy as np
import jax.numpy as jnp

from airpollution_tpu.problems import Domain, Problem, SquarePulseProblem


def test_analytical_solution_closed_form():
    p = Problem(v=(1.0, 0.5), D=0.1, sigma=1.0)
    xyt = np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [-4.0, 5.0, 10.0]])
    out = np.asarray(p.analytical_solution(jnp.asarray(xyt)))
    for row, expect in zip(xyt, out):
        x, y, t = row
        denom = 4 * 0.1 * t + 1.0
        num = (x - 1.0 * t) ** 2 + (y - 0.5 * t) ** 2
        ref = np.exp(-num / denom) / (np.pi * denom)
        assert np.isclose(expect, ref, rtol=1e-12)


def test_initial_condition_matches_solution_at_t0():
    p = Problem()
    xy = np.random.default_rng(0).uniform(-20, 20, size=(50, 2))
    ic = np.asarray(p.initial_condition_fn(jnp.asarray(xy)))
    xyt0 = np.hstack([xy, np.zeros((50, 1))])
    sol = np.asarray(p.analytical_solution(jnp.asarray(xyt0)))
    np.testing.assert_allclose(ic, sol, rtol=1e-12)


def test_boundary_fn_is_solution_and_source_zero():
    p = Problem()
    xyt = np.array([[20.0, 3.0, 1.0], [-20.0, 0.0, 5.0]])
    np.testing.assert_allclose(
        np.asarray(p.boundary_fn(jnp.asarray(xyt))),
        np.asarray(p.analytical_solution(jnp.asarray(xyt))),
    )
    assert np.all(np.asarray(p.source_term(jnp.asarray(xyt))) == 0.0)


def test_domain_is_boundary():
    d = Domain(Lx=20, Ly=20, T=10)
    pts = np.array(
        [[-20.0, 3.0], [20.0, 0.0], [1.0, -20.0], [5.0, 20.0], [0.0, 0.0],
         [19.9999, 0.0]]
    )
    mask = np.asarray(d.is_boundary(jnp.asarray(pts)))
    np.testing.assert_array_equal(
        mask, [True, True, True, True, False, False]
    )


def test_square_pulse_problem():
    p = SquarePulseProblem()
    assert np.allclose(np.asarray(p.v), [1.0, 0.0])
    xy = np.array([[10.0, 10.0], [8.0, 12.0], [7.99, 10.0], [13.0, 9.0]])
    ic = np.asarray(p.initial_condition_fn(jnp.asarray(xy)))
    np.testing.assert_allclose(ic, [1.0, 1.0, 0.0, 0.0])
    xyt = np.array([[20.0, 0.0, 1.0]])
    assert np.asarray(p.boundary_fn(jnp.asarray(xyt)))[0] == 0.0
    assert np.asarray(p.source_term(jnp.asarray(xyt)))[0] == 0.0
