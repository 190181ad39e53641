"""Horn–Schunck solver: equivalence to the dense system and to GN-with-
pinned-luminosity."""

import numpy as np
import jax.numpy as jnp

from ofot_tpu.solvers import hs
import test_gn as gn_test
import fixtures

RNG = np.random.default_rng(71)


def test_matches_dense_solve():
    f1, f2 = fixtures.smooth_blob_pair(12, 14)
    alpha = 0.1
    Z, b = gn_test.dense_gn_system(f1, f2, alpha, 1.0)
    n = 12 * 14
    Z2 = Z[:2 * n, :2 * n]          # drop the luminosity row/col
    b2 = b[:2 * n]
    want = np.linalg.solve(Z2, b2).reshape(2, 12, 14)
    res = hs.solve_fields(jnp.asarray(f1), jnp.asarray(f2), alpha)
    got = np.stack([res.u, res.v])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_preconditioners_agree():
    f1, f2 = fixtures.translating_square(20)
    a = hs.solve_fields(jnp.asarray(f1), jnp.asarray(f2), precond="spectral")
    b = hs.solve_fields(jnp.asarray(f1), jnp.asarray(f2), precond="jacobi")
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u), atol=1e-7)


def test_identical_frames_zero_flow():
    f1, _ = fixtures.smooth_blob_pair(10, 10)
    r = hs.solve_fields(jnp.asarray(f1), jnp.asarray(f1))
    assert float(jnp.abs(r.u).max()) < 1e-8


def test_hs_spectral_precond_handles_vanishing_gradients():
    """Same zero-DC regression as GN: constant-along-an-axis frames must
    not produce NaN flow on the default spectral path."""
    import numpy as np
    y = np.mgrid[0:16, 0:20][0].astype(np.float32)
    f1 = jnp.asarray(np.sin(y / 3) * 0.25 + 0.5)
    res = hs.solve_fields(f1, f1 * 1.01)
    assert np.all(np.isfinite(np.asarray(res.u)))
    assert np.all(np.isfinite(np.asarray(res.v)))
