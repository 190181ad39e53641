"""GN solver: parity against the reference's direct sparse solve."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from ofot_tpu.solvers import gn
import fixtures
import golden_ops as G

REF = "/root/reference"
RNG = np.random.default_rng(11)


def dense_gn_system(f1, f2, alpha, lam):
    """Independent dense assembly of the GN block system from the spec."""
    Ny, Nx = f2.shape
    n = Ny * Nx
    fx = np.zeros((Ny, Nx))
    fx[:, 1:-1] = 0.5 * (f2[:, 2:] - f2[:, :-2])
    fy = np.zeros((Ny, Nx))
    fy[1:-1, :] = 0.5 * (f2[2:, :] - f2[:-2, :])
    ft = f2 - f1
    fx, fy, ft, f2f = fx.ravel(), fy.ravel(), ft.ravel(), f2.ravel()

    L = G.lap_gn_mat(Nx, Ny)
    Z = np.zeros((3 * n, 3 * n))
    Z[:n, :n] = -alpha * L + np.diag(fx ** 2)
    Z[:n, n:2*n] = np.diag(fx * fy)
    Z[:n, 2*n:] = np.diag(-fx * f2f)
    Z[n:2*n, :n] = np.diag(fy * fx)
    Z[n:2*n, n:2*n] = -alpha * L + np.diag(fy ** 2)
    Z[n:2*n, 2*n:] = np.diag(-fy * f2f)
    Z[2*n:, :n] = np.diag(-f2f * fx)
    Z[2*n:, n:2*n] = np.diag(-f2f * fy)
    Z[2*n:, 2*n:] = -lam * L + np.diag(f2f ** 2)
    b = np.concatenate([-fx * ft, -fy * ft, f2f * ft])
    return Z, b


def test_operator_action_matches_dense():
    f1, f2 = fixtures.smooth_blob_pair(10, 12)
    alpha, lam = 0.1, 0.2
    A, M = gn.make_operator(jnp.asarray(f2), alpha, lam)
    Z, _ = dense_gn_system(f1, f2, alpha, lam)
    x = RNG.standard_normal((3, 10, 12))
    want = Z @ x.reshape(3, -1).ravel()
    got = np.asarray(A(jnp.asarray(x))).reshape(3, -1).ravel()
    np.testing.assert_allclose(got, want, atol=1e-11)


def test_solution_matches_dense_solve():
    f1, f2 = fixtures.smooth_blob_pair(12, 14)
    alpha, lam = 0.1, 0.2
    Z, b = dense_gn_system(f1, f2, alpha, lam)
    want = np.linalg.solve(Z, b).reshape(3, 12, 14)
    res = gn.solve_fields(jnp.asarray(f1), jnp.asarray(f2), alpha, lam)
    got = np.stack([res.u, res.v, res.m])
    aepe = np.sqrt((got[0] - want[0]) ** 2 + (got[1] - want[1]) ** 2).mean()
    assert aepe < 1e-6
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_vs_reference_spsolve():
    """End parity: our PCG vs the reference's assemble+spsolve."""
    sys.path.insert(0, REF)
    try:
        import importlib
        ref_classical = importlib.import_module("classical")
        f1, f2 = fixtures.translating_square(24)
        h, w = f1.shape
        ref = ref_classical.GLLOpticalFlow(w, h)
        ref.setAlpha(0.1)
        ref.setLambda(0.2)
        u_r, v_r, m_r = ref.assemble(f1.ravel(), f2.ravel()).process()

        res = gn.solve_fields(jnp.asarray(f1), jnp.asarray(f2), 0.1, 0.2)
        aepe = np.sqrt((np.asarray(res.u).ravel() - u_r) ** 2
                       + (np.asarray(res.v).ravel() - v_r) ** 2).mean()
        assert aepe < 1e-5
        np.testing.assert_allclose(np.asarray(res.m).ravel(), m_r, atol=1e-4)
    finally:
        sys.path.remove(REF)


def test_class_api():
    f1, f2 = fixtures.smooth_blob_pair(8, 9)
    solver = gn.GLLOpticalFlow(9, 8)
    solver.setAlpha(0.1)
    solver.setLambda(0.2)
    u, v, m = solver.assemble(f1.ravel(), f2.ravel()).process()
    assert u.shape == (72,) and v.shape == (72,) and m.shape == (72,)
    assert np.isfinite(u).all()


def test_spectral_precond_handles_vanishing_gradients():
    """Frames constant along an axis give fx == 0, whose mean data diagonal
    is 0 — the DC mode of the spectral preconditioner must act as identity
    instead of dividing 0/0 into NaNs (regression: all-NaN default solve)."""
    import numpy as np
    y = np.mgrid[0:16, 0:20][0].astype(np.float32)
    f1 = jnp.asarray(np.sin(y / 3) * 0.25 + 0.5)     # horizontal stripes
    r = gn.solve_fields(f1, f1 * 1.01)
    for field in (r.u, r.v, r.m):
        assert np.all(np.isfinite(np.asarray(field)))
    # flat frames: zero flow, finite
    flat = jnp.full((12, 14), 0.5)
    r2 = gn.solve_fields(flat, flat)
    assert np.all(np.isfinite(np.asarray(r2.u)))
