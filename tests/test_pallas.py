"""Pallas kernels == their XLA twins (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ofot_tpu.ops import operators
from ofot_tpu.ops.projection import project_paraboloid
from ofot_tpu.ops.pallas import kernels

RNG = np.random.default_rng(31)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode on CPU."""
    real_call = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return real_call(*a, **kw)

    monkeypatch.setattr(kernels.pl, "pallas_call", patched)


def test_projection_kernel_matches_xla():
    p = jnp.asarray(np.float32(RNG.uniform(-4, 3, (3, 8, 16, 24))))
    want = project_paraboloid(p)
    got = kernels.project_paraboloid_pallas(p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_cg_operator_kernel_matches_xla():
    x = jnp.asarray(np.float32(RNG.standard_normal((6, 16, 24))))
    r, eps = 1.0, 1e-2
    want = -r * operators.laplacian_st(x, bc="N") + r * eps * x
    got = kernels.cg_operator_pallas(x, r=r, reg_epsilon=eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fits_in_vmem():
    assert kernels.fits_in_vmem((16, 240, 320))
    assert not kernels.fits_in_vmem((16, 2400, 3200))
