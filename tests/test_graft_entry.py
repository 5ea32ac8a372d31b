"""Regression tests for the driver entry points (__graft_entry__)."""

import jax
import numpy as np
import pytest

import __graft_entry__

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.kernels  # the dryrun runs interpret-mode stripe kernels
def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.kernels
def test_dryrun_multichip_odd_device_count():
    # Odd counts fall back to pure data parallelism (tp=1).
    __graft_entry__.dryrun_multichip(5)
