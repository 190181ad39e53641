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
    # (3,8,16,24): L=3072 -> exact (8,384) tiling; (3,8,15,6): L=720 -> pad
    for shape in ((3, 8, 16, 24), (3, 8, 15, 6)):
        p = jnp.asarray(np.float32(RNG.uniform(-4, 3, shape)))
        want = project_paraboloid(p)
        got = kernels.project_paraboloid_pallas(p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=1e-5)


def test_pick_cols_exact_tiling():
    assert kernels._pick_cols(16 * 240 * 320) == 6400      # production shape
    assert kernels._pick_cols(8 * 1080 * 1920) == 6400     # 1080p
    assert kernels._pick_cols(720) is None                  # pad fallback
    for L in (16 * 240 * 320, 8 * 2160 * 3840, 1024):
        cols = kernels._pick_cols(L)
        assert cols is not None and cols % 128 == 0 \
            and L % (kernels._PROJ_ROWS * cols) == 0
    # every candidate ever returned must be lane-aligned (a 1600 entry once
    # slipped in: 1600 % 128 != 0, crashing the fused kernel's criterion
    # reshape for L = 12800k multiples, e.g. 16x80x50)
    for L in range(128, 200_000, 1024):
        cols = kernels._pick_cols(L)
        assert cols is None or cols % 128 == 0


def test_fused_pointwise_16x80x50():
    """L = 64000 (once selected the non-lane-aligned 1600 chunk width)."""
    gphi = jnp.asarray(np.float32(RNG.uniform(-2, 2, (3, 16, 80, 50))))
    mu = jnp.asarray(np.float32(RNG.uniform(-1, 2, (3, 16, 80, 50))))
    q, mu_new, num, den = kernels.fused_pointwise_pallas(gphi, mu, 1.0)
    q_want = project_paraboloid(gphi + mu)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_want),
                               atol=2e-6, rtol=1e-5)


def test_fused_pointwise_matches_default_path():
    """Fused stepB+stepC+criterion kernel == the unfused XLA ops."""
    r = 1.3
    gphi = jnp.asarray(np.float32(RNG.uniform(-2, 2, (3, 4, 10, 18))))
    mu = jnp.asarray(np.float32(RNG.uniform(-1, 2, (3, 4, 10, 18))))

    q_want = project_paraboloid(gphi + mu / r)
    mu_want = mu + r * (gphi - q_want)
    mu_want = mu_want.at[0].set(jnp.maximum(mu_want[0], 0.0))
    res = gphi[0] + 0.5 * (gphi[1] ** 2 + gphi[2] ** 2)
    num_want = jnp.sum(mu_want[0] * jnp.abs(res))
    den_want = jnp.sum(mu_want[0] * (gphi[1] ** 2 + gphi[2] ** 2))

    q, mu_new, num, den = kernels.fused_pointwise_pallas(gphi, mu, r)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_want),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mu_new), np.asarray(mu_want),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(float(num), float(num_want), rtol=1e-4)
    np.testing.assert_allclose(float(den), float(den_want), rtol=1e-4)


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


def test_dct_solve_pallas_matches_xla_spectral():
    """The fused spectral stepA kernel (measured-negative experimental
    backend, ``--stepA-solver=dct-fused``) must agree with the XLA
    spectral solve — including traced r/reg_epsilon and odd shapes."""
    from ofot_tpu.solvers import dct

    for shape in [(4, 16, 24), (5, 17, 23), (8, 48, 64)]:
        F = jnp.asarray(np.float32(RNG.standard_normal(shape)))
        for r, eps in [(1.0, 1e-2), (0.3, 1e-3)]:
            a = dct.solve_stepA_dct(F, r, eps)
            b = jax.jit(kernels.dct_solve_pallas)(F, r, eps)
            err = float(jnp.abs(a - b).max() / jnp.abs(a).max())
            assert err < 5e-6, (shape, r, eps, err)


def test_dct_fused_ops_alg2_matches_dct_ops():
    """A short ALG2 run under DCTFusedOps tracks the DCT_OPS trajectory."""
    from ofot_tpu.solvers import foto
    from tests.fixtures import smooth_blob_pair

    f1, f2 = smooth_blob_pair(24, 32, dtype=np.float32)
    a = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                             r=1.0, reg_epsilon=1e-2, convergence_tol=0.0,
                             max_it=8, ops=foto.DCT_OPS)
    b = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                             r=1.0, reg_epsilon=1e-2, convergence_tol=0.0,
                             max_it=8, ops=foto.DCTFusedOps())
    np.testing.assert_allclose(np.asarray(a.phi), np.asarray(b.phi),
                               atol=1e-4)
    assert abs(float(a.crit) - float(b.crit)) < 1e-4


def test_cg_operator_blocked_matches_xla():
    """The blocked (DMA-halo) CG operator kernel matches the XLA stencil,
    including odd shapes and traced r/reg_epsilon."""
    for shape in [(6, 16, 24), (5, 17, 23), (4, 48, 40)]:
        x = jnp.asarray(np.float32(RNG.standard_normal(shape)))
        for r, eps in [(1.0, 1e-2), (0.7, 1e-3)]:
            want = -r * operators.laplacian_st(x, bc="N") + (r * eps) * x
            got = kernels.cg_operator_pallas_blocked(x, r, eps)
            assert float(jnp.abs(want - got).max()) < 1e-5, (shape, r)


def test_cg_pallas_ops_alg2_matches_default():
    """A short CG-stepA ALG2 run with the Pallas SpMV tracks DEFAULT_OPS."""
    from ofot_tpu.solvers import foto
    from tests.fixtures import smooth_blob_pair

    f1, f2 = smooth_blob_pair(16, 24, dtype=np.float32)
    kw = dict(r=1.0, reg_epsilon=1e-2, convergence_tol=0.0, max_it=5,
              cg_maxiter=50)
    a = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                             ops=foto.DEFAULT_OPS, **kw)
    b = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                             ops=foto.stepA_ops("cg-pallas"), **kw)
    np.testing.assert_allclose(np.asarray(a.phi), np.asarray(b.phi),
                               atol=5e-3)
    assert abs(float(a.crit) - float(b.crit)) < 1e-3


@pytest.mark.parametrize("alpha", [1.3, 1.7])
def test_fused_pointwise_over_relaxed_matches_xla(alpha):
    """The relaxed fused kernel (alpha*grad_phi + (1-alpha)*q_prev inside,
    criterion on the true grad_phi) tracks the unfused XLA path for both
    the balanced (3) and source-extended (4) component counts."""
    from ofot_tpu.solvers import foto, wfr
    from tests.fixtures import smooth_blob_pair

    f1, f2 = smooth_blob_pair(20, 28, dtype=np.float32)
    a, b = jnp.asarray(f1), jnp.asarray(f2)
    for mod, extra in ((foto, {}), (wfr, {"delta": 8.0})):
        kw = dict(r=1.0, reg_epsilon=1e-2, convergence_tol=0.0, max_it=6,
                  admm_alpha=alpha, **extra)
        x = mod.solve_potential(a, b, 4, ops=foto.DCT_OPS, **kw)
        y = mod.solve_potential(a, b, 4, ops=foto.PALLAS_OPS, **kw)
        assert float(jnp.abs(x.phi - y.phi).max()) < 1e-4
        assert abs(float(x.crit) - float(y.crit)) < 1e-4
