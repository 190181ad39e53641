"""Pyramid coarse-to-fine: captures large displacements the single-level
linearized solvers miss."""

import numpy as np
import jax.numpy as jnp

from ofot_tpu.solvers import pyramid, hs
from ofot_tpu.utils import warp, metrics


def big_shift_pair(n=64, shift=6):
    """Smooth blob translated by `shift` pixels — far beyond the
    single-level linearization range."""
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    blob = lambda cy, cx: np.exp(-(((y - cy) / 7.0) ** 2
                                   + ((x - cx) / 7.0) ** 2))
    return blob(n / 2 - shift / 2, n / 2 - shift / 2), \
        blob(n / 2 + shift / 2, n / 2 + shift / 2)


def _ie(f1, f2, u, v):
    rec = np.clip(np.asarray(warp.apply_flow(
        jnp.asarray(f1), jnp.asarray(u), jnp.asarray(v), None)), 0, 1)
    return metrics.IE(f1.shape[1], f1.shape[0], rec, f2)


def test_pyramid_beats_single_level():
    f1, f2 = big_shift_pair()
    single = hs.solve_fields(jnp.asarray(f1), jnp.asarray(f2), 0.1)
    u_p, v_p = pyramid.solve_hs_pyramid(f1, f2, alpha=0.1, levels=4)
    ie_single = _ie(f1, f2, single.u, single.v)
    ie_pyr = _ie(f1, f2, u_p, v_p)
    assert ie_pyr < 0.5 * ie_single, (ie_single, ie_pyr)


def test_pyramid_flow_magnitude():
    f1, f2 = big_shift_pair(shift=6)
    u, v = pyramid.solve_hs_pyramid(f1, f2, alpha=0.1, levels=4)
    # flow at the blob center should be ~ (6, 6)
    c = slice(28, 36)
    assert 3.0 < float(jnp.mean(u[c, c])) < 9.0
    assert 3.0 < float(jnp.mean(v[c, c])) < 9.0


def test_gn_pyramid_returns_luminosity():
    f1, f2 = big_shift_pair(48, 4)
    u, v, m = pyramid.solve_gn_pyramid(f1, f2, levels=3)
    assert u.shape == m.shape == (48, 48)
    assert np.isfinite(np.asarray(m)).all()
