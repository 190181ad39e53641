"""Wasserstein–Fisher–Rao (unbalanced dynamic OT) solver tests.

Framework extension (no reference equivalent): validates the n-beta
paraboloid projection by its KKT conditions, the delta -> inf limit
against the balanced FOTO solver, and the source/growth physics on
pure-growth and translation+brightening fixtures the balanced solver
cannot represent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofot_tpu.ops.projection import project_paraboloid, project_paraboloid_nd
from ofot_tpu.solvers import foto, wfr

RNG = np.random.default_rng(7)


def _blob(ny, nx, cy, cx, s=6.0):
    y, x = np.mgrid[0:ny, 0:nx].astype(np.float32)
    return np.exp(-(((y - cy) / s) ** 2 + ((x - cx) / s) ** 2))


class TestProjectionNd:
    def test_matches_3component_projection(self):
        p = jnp.asarray(RNG.standard_normal((3, 500)) * 2.0)
        np.testing.assert_allclose(np.asarray(project_paraboloid_nd(p)),
                                   np.asarray(project_paraboloid(p)),
                                   atol=1e-6)

    @pytest.mark.parametrize("k", [1, 2, 3, 5])
    def test_kkt_conditions(self, k):
        """Projected point is in K; for outside points it sits on the
        boundary with (p - p_hat) parallel to the constraint normal
        (1, b_hat) with a nonnegative multiplier — the full KKT system
        of the projection, independent of the cubic-root derivation."""
        p = jnp.asarray(RNG.standard_normal((1 + k, 2000)), jnp.float64)
        ph = np.asarray(project_paraboloid_nd(p))
        p = np.asarray(p)
        a, b = ph[0], ph[1:]
        g = a + 0.5 * np.sum(b * b, axis=0)
        assert g.max() < 1e-9                       # feasible
        outside = (p[0] + 0.5 * np.sum(p[1:] ** 2, axis=0)) > 1e-9
        assert abs(g[outside]).max() < 1e-9         # active constraint
        lam = p[0][outside] - a[outside]            # multiplier from the
        assert lam.min() > -1e-9                    # alpha component
        # beta components: p_i - b_i = lam * b_i
        resid = (p[1:][:, outside] - b[:, outside]
                 - lam[None] * b[:, outside])
        assert abs(resid).max() < 1e-7

    def test_inside_points_untouched(self):
        a = -jnp.abs(jnp.asarray(RNG.standard_normal(200))) * 3 - 2.0
        b = jnp.asarray(RNG.standard_normal((3, 200))) * 0.5
        p = jnp.concatenate([a[None], b])
        np.testing.assert_array_equal(np.asarray(project_paraboloid_nd(p)),
                                      np.asarray(p))


@pytest.fixture(scope="module")
def translated_pair():
    ny = nx = 48
    a = _blob(ny, nx, 24, 22)
    b = _blob(ny, nx, 24, 26)
    a, b = a / a.sum(), b / b.sum()
    s = max(a.max(), b.max())
    return jnp.asarray(a / s), jnp.asarray(b / s)


def test_delta_inf_matches_balanced(translated_pair):
    """delta -> inf turns the source off: potential and distance match
    the balanced FOTO solve on a mass-balanced pair."""
    r0, rT = translated_pair
    # 150 iterations: before the stagnation guard's knife edge (the 1e-8
    # eps shift flips |d crit| < 1e-5 around iteration ~170), so both
    # while_loop solvers run the full budget and compare step-for-step
    kw = dict(r=0.1, reg_epsilon=1e-3, convergence_tol=0.0, max_it=150)
    stW = wfr.solve_potential(r0, rT, 8, delta=1e4, **kw)
    stF = foto.solve_potential(r0, rT, 8, ops=foto.DCT_OPS, **kw)
    assert int(stW.iteration) == int(stF.iteration) == 150
    assert float(jnp.max(jnp.abs(stW.phi - stF.phi))) < 1e-3
    w2 = float(foto.wasserstein2(stF))
    d = float(wfr.wfr_distance(stW))
    assert abs(d - w2) / w2 < 1e-4
    # and the source channel stays negligible
    assert float(jnp.max(jnp.abs(stW.mu[3]))) < 1e-3


def test_pure_growth():
    """Same blob, 1.5x the mass: the geodesic is pure Fisher–Rao — no
    transport, source accounts for the created mass (continuity)."""
    ny = nx = 48
    a = _blob(ny, nx, 24, 24)
    a = a / a.sum()
    r0 = jnp.asarray(a / a.max())
    rT = 1.5 * r0
    res = wfr.solve(r0, rT, 8, delta=5.0, r=0.1, reg_epsilon=1e-3,
                    convergence_tol=0.0, max_it=300)
    sup = np.asarray(r0) > 0.1
    assert abs(np.asarray(res.u)[sup]).max() < 0.5
    assert abs(np.asarray(res.v)[sup]).max() < 0.5
    created = float(wfr.total_created_mass(res.state, 5.0))
    want = float(jnp.sum(rT - r0))
    assert abs(created - want) / want < 0.1
    # growth field ~ the 50% brightening on the support
    assert abs(float(res.growth[24, 24]) - 0.5) < 0.12


def test_translation_with_brightening():
    """Blob translating 4 px AND brightening 40%: with a transport-scale
    delta the flow tracks the translation while the source captures the
    brightening — the regime where balanced OT must distort the flow to
    conserve mass (the physics of the reference's 'lum' datasets)."""
    ny = nx = 48
    a = _blob(ny, nx, 24, 22)
    b = 1.4 * _blob(ny, nx, 24, 26)
    sc = a.max()
    r0, rT = jnp.asarray(a / sc), jnp.asarray(b / sc)
    sup = (a / sc) > 0.1
    res = wfr.solve(r0, rT, 8, delta=20.0, r=0.1, reg_epsilon=1e-3,
                    convergence_tol=0.0, max_it=150)
    u = np.asarray(res.u)
    v = np.asarray(res.v)
    assert 3.0 < u[sup].mean() < 4.5          # tracks the 4 px shift
    assert abs(v[sup].mean()) < 0.2
    assert float(res.growth[24, 26]) > 0.15   # captures the brightening
    # total mass the source creates matches the unbalanced pair
    created = float(wfr.total_created_mass(res.state, 20.0))
    want = float(jnp.sum(rT - r0))
    assert abs(created - want) / want < 0.25


class TestOpsInjection:
    """WFR runs every balanced stepA backend via the same ops interface
    (VERDICT.md r2 weak #5)."""

    def _pair(self):
        ny, nx = 16, 24
        a = _blob(ny, nx, 8, 9, 4.0)
        b = 1.3 * _blob(ny, nx, 8, 13, 4.0)
        return jnp.asarray(a / a.max()), jnp.asarray(b / a.max())

    def test_cg_matches_dct(self):
        """The CG backend solves the SAME shifted operator the spectral
        one diagonalizes (eps + 1/delta^2); with a tight cg_rtol the
        trajectories coincide."""
        r0, rT = self._pair()
        kw = dict(delta=10.0, r=0.5, convergence_tol=1e-6,
                  reg_epsilon=1e-2, max_it=8)
        dct = wfr.solve_potential(r0, rT, 4, ops=foto.DCT_OPS, **kw)
        cg = wfr.solve_potential(r0, rT, 4, ops=foto.DEFAULT_OPS,
                                 cg_rtol=1e-13, **kw)
        # f32 fields, 8 chained solves: agreement to ~1e-4 of the ~6.5
        # potential scale is the fp roundoff envelope
        np.testing.assert_allclose(np.asarray(cg.phi),
                                   np.asarray(dct.phi), atol=1e-4)
        assert int(cg.cg_iterations) > int(dct.cg_iterations)

    def test_pallas_fused_matches_unfused(self):
        """PALLAS_OPS routes the 4-component stepB+stepC+criterion through
        the fused kernel (interpret mode on CPU) — must equal the plain
        XLA iteration."""
        r0, rT = self._pair()
        kw = dict(delta=10.0, r=0.5, convergence_tol=1e-6,
                  reg_epsilon=1e-2, max_it=6)
        plain = wfr.solve_potential(r0, rT, 4, ops=foto.DCT_OPS, **kw)
        fused = wfr.solve_potential(r0, rT, 4, ops=foto.PALLAS_OPS, **kw)
        np.testing.assert_allclose(np.asarray(fused.phi),
                                   np.asarray(plain.phi), atol=1e-5)
        np.testing.assert_allclose(np.asarray(fused.mu),
                                   np.asarray(plain.mu), atol=1e-5)
        np.testing.assert_allclose(float(fused.crit), float(plain.crit),
                                   rtol=1e-4)

    def test_admm_alpha_same_fixed_point(self):
        """Over-relaxation targets the same saddle (the augmented
        Lagrangian is unchanged): the converged flow statistics agree at
        the ~5% level even though the over-relaxed iterates oscillate
        more on this fixture (pixelwise iterate differences stay within
        the two runs' own convergence gap)."""
        r0, rT = self._pair()
        kw = dict(delta=10.0, r=0.2, convergence_tol=0.0,
                  reg_epsilon=1e-3, max_it=250)
        base = wfr.solve(r0, rT, 6, admm_alpha=1.0, **kw)
        over = wfr.solve(r0, rT, 6, admm_alpha=1.5, **kw)
        sup = np.asarray(r0) > 0.2
        assert sup.any()
        u_b = np.asarray(base.u)[sup].mean()
        u_o = np.asarray(over.u)[sup].mean()
        assert abs(u_b - u_o) < 0.2          # same ~4 px transport
        g = np.abs(np.asarray(over.growth) - np.asarray(base.growth))[sup]
        assert g.max() < 0.1                 # same brightening field


def test_auto_r_exact_invariance():
    """auto_r on raw inputs == manual peak normalization, bitwise-ish —
    the UNBALANCED iteration (including the zeta/delta source channel:
    sigma scales with mu and phi/delta pairs against it unchanged) is
    jointly 1-homogeneous in (mu, rho, r), same as the balanced claim
    pinned in test_foto.TestAutoR (ADVICE.md r2)."""
    ny = nx = 40
    a = _blob(ny, nx, 20, 16, 5.0).astype(np.float64)
    b = 1.3 * _blob(ny, nx, 20, 22, 5.0).astype(np.float64)
    a, b = a / a.sum(), b / b.sum()          # unit MASS -> peak ~1e-2
    p = max(a.max(), b.max())
    kw = dict(delta=15.0, r=0.1, reg_epsilon=1e-3, convergence_tol=1e-4,
              max_it=120)
    ra = wfr.solve_potential(jnp.asarray(a), jnp.asarray(b), 6,
                             auto_r=True, **kw)
    rb = wfr.solve_potential(jnp.asarray(a / p), jnp.asarray(b / p), 6,
                             **kw)
    assert int(ra.iteration) == int(rb.iteration)
    assert float(jnp.max(jnp.abs(ra.phi - rb.phi))) < 1e-10


def test_checkpoint_roundtrip(translated_pair, tmp_path):
    """The 4-component state checkpoints through the existing machinery."""
    from ofot_tpu.utils import checkpoint

    r0, rT = translated_pair
    st = wfr.solve_potential(r0, rT, 4, delta=10.0, r=0.5,
                             reg_epsilon=1e-2, convergence_tol=0.0,
                             max_it=5)
    checkpoint.save_state(str(tmp_path / "w"), st)
    back = checkpoint.load_state(str(tmp_path / "w"))
    np.testing.assert_array_equal(np.asarray(st.mu), np.asarray(back.mu))
    resumed = wfr.solve_potential(r0, rT, 4, delta=10.0, r=0.5,
                                  reg_epsilon=1e-2, convergence_tol=0.0,
                                  max_it=10, init=back)
    assert int(resumed.iteration) == 10


def test_delta_transport_cutoff_regimes():
    """The ~pi*delta/2 transport cutoff, pinned in BOTH regimes (round-5
    delta study, RESULTS.md).

    Compact-density transport (the OT regime the CLI's generic delta=10
    default serves): the cutoff is REAL — on a 5 px blob translation the
    recovered motion grows monotonically with delta (measured 0.93 px at
    delta=2.5 vs 4.47 px at delta=10).

    Frame-scale sweep data is the OTHER regime: there the committed
    study (results_r5_wfr25/35 vs results_r5) shows mb2 EE flat to the
    THIRD digit across delta 2.5/3.5/5 including the 11.7 px LargeMotion
    while -lum IE improves monotonically downward — which is why the
    pipeline ships delta=2.5 (cli/pipeline.py WFR_ARGS) while the CLI
    keeps 10."""
    import numpy as np
    import jax.numpy as jnp
    from tests.fixtures import smooth_blob_pair

    f1, f2 = smooth_blob_pair(28, 32, shift=(0.0, 5.0))   # 5 px > cutoff
    a, b = jnp.asarray(f1, jnp.float32), jnp.asarray(f2, jnp.float32)
    sup = np.asarray(f1) > 0.25 * np.asarray(f1).max()
    rec = {}
    for delta in (2.5, 10.0):
        r = wfr.solve(a, b, 8, delta=delta, r=0.1, reg_epsilon=1e-3,
                      convergence_tol=0.05, max_it=400)
        rec[delta] = float(np.asarray(r.u)[sup].mean())
    # below the cutoff most of the 5 px motion is absorbed as growth...
    assert rec[2.5] < 2.0, rec
    # ...well above it the transport recovers most of the shift
    assert rec[10.0] > 3.5, rec
