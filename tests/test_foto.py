"""FOTO ALG2 solver: parity against the reference benamou_brenier.solve."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from ofot_tpu.solvers import foto, flow_extract
from ofot_tpu.ops import operators
import fixtures

REF = "/root/reference"


def _ref_modules():
    sys.path.insert(0, REF)
    import importlib
    bb = importlib.import_module("benamou_brenier")
    ut = importlib.import_module("utils")
    return bb, ut


def test_init_state_matches_reference_interp():
    rho0 = jnp.asarray(np.random.default_rng(0).random((6, 5)))
    rhoT = jnp.asarray(np.random.default_rng(1).random((6, 5)))
    st = foto.init_state(rho0, rhoT, Nt=4)
    for n in range(4):
        want = (1 - n / 3) * np.asarray(rho0) + (n / 3) * np.asarray(rhoT)
        np.testing.assert_allclose(st.mu[0, n], want, atol=1e-12)
    assert np.all(np.asarray(st.mu[1:]) == 0)
    assert float(st.crit) == -1.0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_single_iteration_matches_reference():
    """After exactly one ALG2 iteration, phi / q / mu / crit must match the
    reference's to solver-tolerance."""
    bb, _ = _ref_modules()
    try:
        f1, f2 = fixtures.translating_square(18)
        Nt = 4
        Ny, Nx = f1.shape
        r, eps = 1.0, 1e-2

        # --- reference: one iteration (max_it=1 runs the loop body once) ---
        # capture its internals by replicating its driver calls
        import operators as ref_ops
        from scipy import sparse
        rho0, rhoT = f1.ravel(), f2.ravel()
        mu = np.zeros(3 * Nt * Nx * Ny)
        for n in range(Nt):
            mu[n*Nx*Ny:(n+1)*Nx*Ny] = (1 - n/(Nt-1))*rho0 + (n/(Nt-1))*rhoT
        q0 = np.zeros(3 * Nt * Nx * Ny)
        A = (-r * ref_ops.laplacian_st(Nt, Nx, Ny, 1, 1, 1, "N")
             + r * eps * sparse.eye(Nt * Nx * Ny))
        div_ref = ref_ops.div_st(Nt, Nx, Ny, 1, 1, 1, "N")
        grad_ref = ref_ops.grad_st(Nt, Nx, Ny, 1, 1, 1, "N")
        phi_ref = bb.solve_benamou_brenier_step(
            mu, q0, rho0, rhoT, r, A, div_ref, Nt, Nx, Ny, 1, 1, 1)
        gp_ref = grad_ref @ phi_ref
        q_ref = bb.stepB(gp_ref + mu / r, Nt, Nx, Ny)
        mu_ref = mu + r * (gp_ref - q_ref)
        mu_ref[:Nt*Nx*Ny] = np.maximum(mu_ref[:Nt*Nx*Ny], 0)

        # --- ours ---
        st0 = foto.init_state(jnp.asarray(f1), jnp.asarray(f2), Nt)
        st1 = foto.alg2_iteration(
            st0, jnp.asarray(f1), jnp.asarray(f2), r=r, reg_epsilon=eps,
            convergence_tol=1e-9)

        np.testing.assert_allclose(
            np.asarray(st1.phi).ravel(), phi_ref, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(st1.q).reshape(3, -1).ravel(), q_ref, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(st1.mu).reshape(3, -1).ravel(), mu_ref, atol=5e-4)
    finally:
        sys.path.remove(REF)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_full_solve_matches_reference():
    """Full multi-iteration solve: displacement fields within AEPE 0.05
    of the reference (the BASELINE.json parity budget)."""
    bb, _ = _ref_modules()
    try:
        f1, f2 = fixtures.translating_square(18)
        Nt = 4
        kw = dict(r=1.0, convergence_tol=0.15, reg_epsilon=1e-2, max_it=12)
        u_r, v_r, m_r = bb.solve(f1.ravel(), f2.ravel(), Nt,
                                 f1.shape[1], f1.shape[0], **{
                                     "r": 1.0, "convergence_tol": 0.15,
                                     "reg_epsilon": 1e-2, "max_it": 12})
        res = foto.solve(jnp.asarray(f1), jnp.asarray(f2), Nt, **kw)
        aepe = np.sqrt((np.asarray(res.u).ravel() - u_r) ** 2
                       + (np.asarray(res.v).ravel() - v_r) ** 2).mean()
        assert aepe < 0.05, f"AEPE vs reference {aepe}"
        np.testing.assert_allclose(np.asarray(res.m).ravel(), m_r, atol=0.05)
    finally:
        sys.path.remove(REF)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_flow_extract_matches_reference():
    """Trajectory integration + luminosity vs reference
    opticalflow_from_benamoubrenier on a random smooth potential."""
    _, ut = _ref_modules()
    try:
        import operators as ref_ops
        rng = np.random.default_rng(5)
        Nt, Ny, Nx = 5, 12, 10
        # smooth random potential
        phi = rng.standard_normal((Nt, Ny, Nx))
        from scipy.ndimage import gaussian_filter
        phi = gaussian_filter(phi, sigma=(0, 2, 2)) * 5.0

        grad_ref = ref_ops.grad(Nx, Ny, 1, 1, "N")
        div_ref = ref_ops.div(Nx, Ny, 1, 1, "D")
        u_r, v_r, m_r = ut.opticalflow_from_benamoubrenier(
            phi.reshape(Nt, -1).ravel(), Nt, Nx, Ny, grad_ref, div_ref)

        u, v, m = flow_extract.flow_from_potential(jnp.asarray(phi))
        np.testing.assert_allclose(np.asarray(u).ravel(), u_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v).ravel(), v_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(m).ravel(), m_r, atol=1e-9)
    finally:
        sys.path.remove(REF)


def test_solver_reduces_criterion():
    f1, f2 = fixtures.translating_square(24)
    st = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                              r=1.0, convergence_tol=1e-6,
                              reg_epsilon=1e-2, max_it=20)
    assert float(st.crit) < 0.5   # reference reaches ~0.16 in 20 iters
    assert int(st.iteration) >= 2
    assert np.isfinite(np.asarray(st.phi)).all()


def test_resume_from_state():
    """Checkpoint/resume: 10 iterations == 5 + resume 5."""
    f1, f2 = fixtures.translating_square(18)
    kw = dict(r=1.0, convergence_tol=1e-9, reg_epsilon=1e-2)
    full = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                                max_it=10, **kw)
    half = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                                max_it=5, **kw)
    resumed = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                                   max_it=10, init=half, **kw)
    np.testing.assert_allclose(np.asarray(resumed.phi), np.asarray(full.phi),
                               atol=1e-10)
    assert int(resumed.iteration) == int(full.iteration) == 10


def test_history_matches_loop():
    """The scan-based history variant reproduces the while_loop solve."""
    f1, f2 = fixtures.translating_square(18)
    kw = dict(r=1.0, reg_epsilon=1e-2)
    st, hist = foto.solve_potential_with_history(
        jnp.asarray(f1), jnp.asarray(f2), 4, 6, **kw)
    loop = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                                convergence_tol=0.0, max_it=6,
                                cg_rtol=1e-6, **kw)
    # stagnation may stop the while_loop early; compare at its iteration
    k = int(loop.iteration)
    np.testing.assert_allclose(float(hist["crit"][k - 1]), float(loop.crit),
                               rtol=1e-6)
    assert hist["crit"].shape == (6,)
    # criterion should broadly decrease on this fixture
    assert float(hist["crit"][-1]) < float(hist["crit"][0])


def test_admm_over_relaxation():
    """alpha != 1 (over-relaxed ADMM, net-new vs reference) converges to
    the same transport: fewer/equal iterations to stagnation and a flow
    close to the alpha=1 solution; alpha=1 is untouched reference math."""
    f1, f2 = fixtures.smooth_blob_pair(24, 28)
    kw = dict(r=1.0, convergence_tol=0.01, reg_epsilon=1e-2, max_it=300,
              ops=foto.DCT_OPS)
    base = foto.solve(jnp.asarray(f1), jnp.asarray(f2), 6, **kw)
    over = foto.solve(jnp.asarray(f1), jnp.asarray(f2), 6,
                      admm_alpha=1.7, **kw)
    assert int(over.state.iteration) <= int(base.state.iteration)
    # same fixed point: displacement fields agree to solver tolerance
    du = np.abs(np.asarray(over.u) - np.asarray(base.u)).max()
    dv = np.abs(np.asarray(over.v) - np.asarray(base.v)).max()
    assert du < 0.15 and dv < 0.15


def test_wasserstein2_of_translation():
    """W2 of a translated unit-mass blob == the shift distance (the OT
    value API, net-new vs reference): BB action -> W2 via the horizon
    rescaling, trapezoid time quadrature.  Shares one solve with
    test_sinkhorn.test_matches_dynamic_w2 (fixtures.translated_blob_w2)."""
    _, _, shift, st = fixtures.translated_blob_w2()
    w2 = float(foto.wasserstein2(st))
    assert abs(w2 - shift) / shift < 0.05, w2
    # kinetic action is invariant under the mass scale used (both scale
    # linearly); wasserstein2 normalizes it away
    assert float(foto.kinetic_action(st.mu)) > 0


class TestAutoR:
    """Scale-invariant ADMM penalty (foto.scale_invariant_r / auto_r)."""

    def _pair(self):
        y, x = np.mgrid[0:32, 0:36].astype(np.float64)

        def blob(cy, cx):
            return np.exp(-(((y - cy) / 5.0) ** 2 + ((x - cx) / 5.0) ** 2))

        a, b = blob(16, 14), blob(16, 18)
        return a / a.sum(), b / b.sum()      # unit MASS -> peak ~8e-3

    def test_exact_invariance(self):
        """auto_r on raw inputs == manual peak normalization, bitwise-ish:
        the ALG2 iteration is jointly 1-homogeneous in (mu, rho, r)."""
        a, b = self._pair()
        p = max(a.max(), b.max())
        ra = foto.solve_potential(
            jnp.asarray(a), jnp.asarray(b), 6, r=0.1, reg_epsilon=1e-3,
            convergence_tol=1e-4, max_it=120, ops=foto.DCT_OPS, auto_r=True)
        rb = foto.solve_potential(
            jnp.asarray(a / p), jnp.asarray(b / p), 6, r=0.1,
            reg_epsilon=1e-3, convergence_tol=1e-4, max_it=120,
            ops=foto.DCT_OPS)
        assert int(ra.iteration) == int(rb.iteration)
        assert float(jnp.max(jnp.abs(ra.phi - rb.phi))) < 1e-10

    def test_fixes_unit_mass_stall(self):
        """With r=1 on unit-mass inputs ALG2 stalls on the stagnation
        guard having moved almost no mass; auto_r recovers the
        translation (the documented motivation for the flag)."""
        from ofot_tpu.solvers import flow_extract
        a, b = self._pair()
        an = a / a.sum()

        def mw_u(state):
            u, _, _ = flow_extract.flow_from_potential(state.phi)
            return float((an * np.asarray(u)).sum())

        stalled = foto.solve_potential(
            jnp.asarray(a), jnp.asarray(b), 6, r=1.0, reg_epsilon=1e-3,
            convergence_tol=1e-4, max_it=400, ops=foto.DCT_OPS)
        fixed = foto.solve_potential(
            jnp.asarray(a), jnp.asarray(b), 6, r=0.1, reg_epsilon=1e-3,
            convergence_tol=1e-4, max_it=400, ops=foto.DCT_OPS,
            auto_r=True)
        assert abs(mw_u(stalled)) < 1.0          # barely moved (true: 4)
        assert abs(mw_u(fixed) - 4.0) < 0.5      # recovered
