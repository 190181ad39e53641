"""Driver hooks: entry() compiles single-chip; dryrun_multichip executes."""

import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft


def test_entry_jits():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    phi, crit = out
    assert phi.shape[0] == 8           # Nt
    assert np.isfinite(np.asarray(phi)).all()
    assert np.isfinite(float(crit))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_1():
    graft.dryrun_multichip(1)


def test_mesh_factors():
    assert graft._mesh_factors(8) == (2, 2, 2)
    assert graft._mesh_factors(4) == (1, 2, 2)
    assert graft._mesh_factors(2) == (1, 2, 1)
    assert graft._mesh_factors(1) == (1, 1, 1)


def test_spatial_factors():
    for n in (1, 2, 4, 8, 16):
        y, x = graft._spatial_factors(n)
        assert y * x == n
    assert graft._spatial_factors(8) == (4, 2)
    assert graft._spatial_factors(4) == (2, 2)
    assert graft._spatial_factors(1) == (1, 1)
