"""Robustness: fp32 vs fp64 agreement, degenerate inputs, guards."""

import numpy as np
import jax.numpy as jnp

from ofot_tpu.solvers import foto, gn
from ofot_tpu.utils import warp, metrics
import fixtures


def test_foto_fp32_close_to_fp64():
    f1, f2 = fixtures.translating_square(20)
    kw = dict(r=1.0, convergence_tol=0.1, reg_epsilon=1e-2, max_it=10)
    r64 = foto.solve(jnp.asarray(f1), jnp.asarray(f2), 4, **kw)
    r32 = foto.solve(jnp.asarray(f1, jnp.float32),
                     jnp.asarray(f2, jnp.float32), 4, **kw)
    aepe = np.sqrt(
        (np.asarray(r32.u, np.float64) - np.asarray(r64.u)) ** 2
        + (np.asarray(r32.v, np.float64) - np.asarray(r64.v)) ** 2).mean()
    assert aepe < 0.01, aepe


def test_foto_identical_frames():
    """No mass to move -> ~zero flow, solver stops early."""
    f1, _ = fixtures.smooth_blob_pair(16, 18)
    res = foto.solve(jnp.asarray(f1), jnp.asarray(f1), 4, r=1.0,
                     convergence_tol=0.05, reg_epsilon=1e-2, max_it=30)
    assert float(jnp.abs(res.u).max()) < 0.2
    assert np.isfinite(np.asarray(res.u)).all()


def test_gn_identical_frames():
    f1, _ = fixtures.smooth_blob_pair(16, 18)
    r = gn.solve_fields(jnp.asarray(f1), jnp.asarray(f1))
    assert float(jnp.abs(r.u).max()) < 1e-6
    assert float(jnp.abs(r.m).max()) < 1e-6


def test_foto_black_frames():
    """All-zero densities: criterion hits 0/eps — must not NaN-loop."""
    z = jnp.zeros((12, 14))
    st = foto.solve_potential(z, z, 4, r=1.0, convergence_tol=0.1,
                              reg_epsilon=1e-2, max_it=20)
    assert int(st.iteration) <= 20
    assert np.isfinite(np.asarray(st.phi)).all()


def test_warp_with_nan_flow_does_not_crash():
    f1, _ = fixtures.smooth_blob_pair(8, 8)
    u = jnp.full((8, 8), jnp.nan)
    out = warp.apply_flow(jnp.asarray(f1), u, u, None)
    assert out.shape == (8, 8)      # NaNs propagate, no crash


def test_metrics_all_outliers():
    """Every pixel dropped by the EE>50 rule -> NaN mean, like the
    reference's division by len([]) would produce a ZeroDivisionError;
    here it degrades to NaN rather than raising."""
    n = 16
    u = np.full(n, 100.0)
    z = np.zeros(n)
    m, s = metrics.EE(n, 1, u, z, z, z)
    assert np.isnan(m) and np.isnan(s)
