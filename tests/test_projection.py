"""Golden tests for the paraboloid projection (stepB equivalent).

Two independent checks:
  1. mathematical: the projected radius rho_h must be the largest real root
     of r^3 + 2(alpha+1) r - 2 rho = 0 (the KKT stationarity cubic of the
     projection onto a + |b|^2/2 <= 0), found here via np.roots;
  2. behavioral: bitwise-close match against the reference's stepB
     (reference benamou_brenier.py:93-149) when the reference is mounted.
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from ofot_tpu.ops.projection import project_paraboloid

REF = "/root/reference"
RNG = np.random.default_rng(7)


def scalar_project(alpha, beta1, beta2):
    """Independent scalar implementation via polynomial root-finding."""
    if 2 * alpha + beta1**2 + beta2**2 <= 0:
        return alpha, beta1, beta2
    rho = np.hypot(beta1, beta2)
    roots = np.roots([1.0, 0.0, 2.0 * (alpha + 1.0), -2.0 * rho])
    real = roots[np.abs(roots.imag) < 1e-9].real
    r_h = max(real.max(), 0.0)
    a_h = -0.5 * r_h**2
    if rho > 0:
        return a_h, r_h * beta1 / rho, r_h * beta2 / rho
    return a_h, r_h, 0.0


def make_points(n=4096):
    # cover inside, near-boundary, far-outside, both cubic branches
    alpha = RNG.uniform(-4, 3, n)
    beta = RNG.uniform(-3, 3, (2, n))
    # targeted edge cases
    edge = np.array([
        [0.0, 0.0, 0.0],        # origin (inside boundary)
        [1.0, 0.0, 0.0],        # outside with rho=0 -> Cardano, zh=0... exact
        [-1.0, 1.0, 0.0],       # alpha=-1 outside
        [-2.0, 0.5, 0.5],       # trig branch
        [-2.0, 1e-8, 0.0],      # trig branch, tiny rho
        [5.0, 1e-8, -1e-8],     # far outside, tiny rho
        [-1.0 + 1e-9, 2.0, 0.0],  # near branch switch
        [-1.0 - 1e-9, 1e-6, 0.0],  # near branch switch, tiny rho
    ]).T
    return np.concatenate([np.vstack([alpha, beta]), edge], axis=1)


def test_vs_cubic_roots():
    p = make_points()
    got = np.asarray(project_paraboloid(jnp.asarray(p)))
    for i in range(p.shape[1]):
        a, b1, b2 = scalar_project(*p[:, i])
        np.testing.assert_allclose(
            got[:, i], [a, b1, b2], atol=2e-6, rtol=1e-6,
            err_msg=f"point {p[:, i]}")


def test_projected_points_in_K():
    p = make_points()
    out = np.asarray(project_paraboloid(jnp.asarray(p)))
    viol = 2 * out[0] + out[1] ** 2 + out[2] ** 2
    assert viol.max() <= 1e-6


def test_no_nans():
    p = make_points()
    out = np.asarray(project_paraboloid(jnp.asarray(p)))
    assert np.isfinite(out).all()


def test_shapes_nd():
    p = jnp.asarray(RNG.standard_normal((3, 2, 4, 5)))
    out = project_paraboloid(p)
    assert out.shape == (3, 2, 4, 5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_vs_reference_stepB():
    sys.path.insert(0, REF)
    try:
        import importlib
        ref_bb = importlib.import_module("benamou_brenier")
        p = make_points(512)
        n = p.shape[1]
        # reference stepB takes the flat (3*N,) layout with Nt*Nx*Ny = N
        want = ref_bb.stepB(p.reshape(-1), 1, 1, n).reshape(3, n)
        got = np.asarray(project_paraboloid(jnp.asarray(p)))
        np.testing.assert_allclose(got, want, atol=1e-9, rtol=1e-9)
    finally:
        sys.path.remove(REF)
