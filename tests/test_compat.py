"""Compat layer: reference signatures on the TPU engine, vs the reference."""

import os
import sys

import numpy as np
import pytest

import ofot_tpu.compat as compat
import fixtures

REF = "/root/reference"
RNG = np.random.default_rng(61)


def test_solve_reference_signature():
    f1, f2 = fixtures.translating_square(18)
    h, w = f1.shape
    u, v, m = compat.solve(f1.ravel(), f2.ravel(), 4, w, h,
                           r=1.0, convergence_tol=0.15,
                           reg_epsilon=1e-2, max_it=8)
    assert u.shape == v.shape == m.shape == (w * h,)
    assert np.isfinite(u).all()


def test_gll_reference_usage():
    f1, f2 = fixtures.smooth_blob_pair(10, 12)
    c = compat.GLLOpticalFlow(12, 10)
    c.setAlpha(0.1)
    c.setLambda(0.2)
    u, v, m = c.assemble(f1.ravel(), f2.ravel()).process()
    assert u.shape == (120,)


def test_flo_roundtrip(tmp_path):
    u = RNG.standard_normal(35).astype(np.float32)
    v = RNG.standard_normal(35).astype(np.float32)
    compat.saveFlo(7, 5, u, v, str(tmp_path / "x.flo"))
    w, h, u2, v2 = compat.openFlo(str(tmp_path / "x.flo"))
    assert (w, h) == (7, 5)
    np.testing.assert_array_equal(u2, u)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_against_reference_functions():
    sys.path.insert(0, REF)
    try:
        import importlib
        ref_utils = importlib.import_module("utils")
        h, w = 9, 11
        f1 = RNG.random(h * w)
        u = RNG.uniform(-2, 2, h * w)
        v = RNG.uniform(-2, 2, h * w)
        m = RNG.uniform(-0.2, 0.2, h * w)
        np.testing.assert_allclose(
            compat.apply_opticalflow(f1, u, v, w, h, m),
            ref_utils.apply_opticalflow(f1, u, v, w, h, m), atol=1e-12)

        Nt = 4
        un = RNG.uniform(-1, 1, (Nt, w * h))
        vn = RNG.uniform(-1, 1, (Nt, w * h))
        for (x0, y0) in [(0, 0), (3.0, 4.0), (w - 1, h - 1)]:
            np.testing.assert_allclose(
                compat.reconstructTrajectory(x0, y0, un, vn, w, h, Nt),
                ref_utils.reconstructTrajectory(x0, y0, un, vn, w, h, Nt),
                atol=1e-12)
    finally:
        sys.path.remove(REF)


def test_apply_opticalflow_reference_sentinel():
    """The reference's no-luminosity default is np.array([None]) (object
    dtype, reference utils.py:186) — a ported caller passing it explicitly
    must get the plain warp, same as m=None."""
    h, w = 6, 7
    rng = np.random.RandomState(3)
    f1 = rng.rand(h * w)
    u = rng.randn(h * w) * 0.5
    v = rng.randn(h * w) * 0.5
    plain = compat.apply_opticalflow(f1, u, v, w, h, None)
    sentinel = compat.apply_opticalflow(f1, u, v, w, h, np.array([None]))
    np.testing.assert_allclose(sentinel, plain)
