"""Utilities: warp, metrics, .flo I/O — parity vs the reference."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from ofot_tpu.utils import warp, metrics, flo, image
import fixtures

REF = "/root/reference"
RNG = np.random.default_rng(17)


def _ref_utils():
    sys.path.insert(0, REF)
    import importlib
    return importlib.import_module("utils")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
class TestVsReference:
    @classmethod
    def setup_class(cls):
        cls.ut = _ref_utils()

    @classmethod
    def teardown_class(cls):
        sys.path.remove(REF)

    def test_warp_random_flow(self):
        h, w = 14, 17
        f1 = RNG.random((h, w))
        u = RNG.uniform(-3, 3, (h, w))
        v = RNG.uniform(-3, 3, (h, w))
        m = RNG.uniform(-0.5, 0.5, (h, w))
        want = self.ut.apply_opticalflow(
            f1.ravel(), u.ravel(), v.ravel(), w, h, m.ravel())
        got = warp.apply_flow(jnp.asarray(f1), jnp.asarray(u),
                              jnp.asarray(v), jnp.asarray(m))
        np.testing.assert_allclose(np.asarray(got).ravel(), want, atol=1e-12)

    def test_warp_extreme_flow(self):
        """Flows that push source positions far out of the image."""
        h, w = 9, 11
        f1 = RNG.random((h, w))
        u = RNG.uniform(-20, 20, (h, w))
        v = RNG.uniform(-20, 20, (h, w))
        want = self.ut.apply_opticalflow(
            f1.ravel(), u.ravel(), v.ravel(), w, h,
            np.zeros(h * w))
        got = warp.apply_flow(jnp.asarray(f1), jnp.asarray(u),
                              jnp.asarray(v), jnp.zeros((h, w)))
        np.testing.assert_allclose(np.asarray(got).ravel(), want, atol=1e-12)

    def test_warp_integer_flow(self):
        h, w = 8, 8
        f1 = RNG.random((h, w))
        u = np.full((h, w), 2.0)
        v = np.full((h, w), -1.0)
        want = self.ut.apply_opticalflow(
            f1.ravel(), u.ravel(), v.ravel(), w, h, np.zeros(h * w))
        got = warp.apply_flow(jnp.asarray(f1), jnp.asarray(u),
                              jnp.asarray(v), jnp.zeros((h, w)))
        np.testing.assert_allclose(np.asarray(got).ravel(), want, atol=1e-12)

    def test_EE(self):
        n = 500
        u, v = RNG.standard_normal(n), RNG.standard_normal(n)
        ugt, vgt = RNG.standard_normal(n), RNG.standard_normal(n)
        # inject outliers that must be dropped
        u[:5] += 100.0
        want = self.ut.EE(n, 1, u, v, ugt, vgt)
        got = metrics.EE(n, 1, u, v, ugt, vgt)
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_AE(self):
        n = 400
        u, v = RNG.standard_normal(n), RNG.standard_normal(n)
        ugt, vgt = u.copy(), v.copy()
        ugt[10:] = RNG.standard_normal(n - 10)
        want = self.ut.AE(n, 1, u, v, ugt, vgt)
        got = metrics.AE(n, 1, u, v, ugt, vgt)
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_IE(self):
        h, w = 12, 13
        a, b = RNG.random((h, w)), RNG.random((h, w))
        want = self.ut.IE(w, h, a.ravel(), b.ravel())
        got = metrics.IE(w, h, a, b)
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_flo_byte_parity(self, tmp_path):
        h, w = 6, 7
        u = RNG.standard_normal(h * w)
        v = RNG.standard_normal(h * w)
        ours, theirs = tmp_path / "a.flo", tmp_path / "b.flo"
        flo.write_flo(w, h, u, v, str(ours))
        self.ut.saveFlo(w, h, u, v, str(theirs))
        assert ours.read_bytes() == theirs.read_bytes()

    def test_flo_read_parity(self, tmp_path):
        h, w = 5, 9
        u = RNG.standard_normal(h * w)
        v = RNG.standard_normal(h * w)
        p = tmp_path / "c.flo"
        flo.write_flo(w, h, u, v, str(p))
        w2, h2, u2, v2 = self.ut.openFlo(str(p))
        w3, h3, u3, v3 = flo.read_flo(str(p))
        assert (w2, h2) == (w3, h3) == (w, h)
        np.testing.assert_allclose(u3, u2, atol=0)
        np.testing.assert_allclose(v3, v2, atol=0)


def test_flo_roundtrip(tmp_path):
    h, w = 10, 11
    u = RNG.standard_normal(h * w).astype(np.float32)
    v = RNG.standard_normal(h * w).astype(np.float32)
    p = tmp_path / "r.flo"
    flo.write_flo(w, h, u, v, str(p))
    w2, h2, u2, v2 = flo.read_flo(str(p))
    assert (w2, h2) == (w, h)
    np.testing.assert_array_equal(u2, u)
    np.testing.assert_array_equal(v2, v)


def test_image_roundtrip(tmp_path):
    f = RNG.random((16, 20))
    p = tmp_path / "img.png"
    image.save_grayscale(f, str(p))
    f2, w, h = image.open_grayscale(str(p))
    assert (w, h) == (20, 16)
    assert np.abs(f2 - f).max() < 1.0 / 255 + 1e-9


def test_warp_identity_flow():
    f1, _ = fixtures.smooth_blob_pair(10, 12)
    z = jnp.zeros((10, 12))
    out = warp.apply_flow(jnp.asarray(f1), z, z, None)
    np.testing.assert_allclose(np.asarray(out), f1, atol=1e-12)
