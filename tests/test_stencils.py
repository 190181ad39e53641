"""Golden tests: matrix-free stencils vs dense spec-built operator matrices,
and (when available) vs the reference repo's own scipy operators."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from ofot_tpu.ops import stencils, operators
import golden_ops as G

RNG = np.random.default_rng(42)
REF = "/root/reference"


def rnd(*shape):
    return RNG.standard_normal(shape)


@pytest.mark.parametrize("n", [5, 8, 13])
@pytest.mark.parametrize("h", [1.0, 2.0])
@pytest.mark.parametrize("bc", ["N", "D"])
class Test1D:
    def test_central(self, n, h, bc):
        x = rnd(n)
        want = G.d_central(n, h, bc) @ x
        got = stencils.grad_central(jnp.asarray(x), h, bc)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_central_weird(self, n, h, bc):
        x = rnd(n)
        want = G.d_central(n, h, bc, weird=True) @ x
        got = stencils.grad_central_weird(jnp.asarray(x), h, bc)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_forward(self, n, h, bc):
        x = rnd(n)
        want = G.d_forward(n, h, bc) @ x
        got = stencils.grad_forward(jnp.asarray(x), h, bc)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_forward_weird(self, n, h, bc):
        x = rnd(n)
        want = G.d_forward(n, h, bc, weird=True) @ x
        got = stencils.grad_forward_weird(jnp.asarray(x), h, bc)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_backward(self, n, h, bc):
        x = rnd(n)
        want = G.d_backward(n, h, bc) @ x
        got = stencils.grad_backward(jnp.asarray(x), h, bc)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_backward_weird(self, n, h, bc):
        x = rnd(n)
        want = G.d_backward(n, h, bc, weird=True) @ x
        got = stencils.grad_backward_weird(jnp.asarray(x), h, bc)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_lap(self, n, h, bc):
        x = rnd(n)
        want = G.d_lap(n, h, bc) @ x
        got = stencils.lap1d(jnp.asarray(x), h, bc)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_forward_adjoint(self, n, h, bc):
        x = rnd(n)
        want = G.d_forward(n, h, bc).T @ x
        got = stencils.grad_forward_adjoint(jnp.asarray(x), h, bc)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_central_adjoint(self, n, h, bc):
        x = rnd(n)
        want = G.d_central(n, h, bc).T @ x
        got = stencils.grad_central_adjoint(jnp.asarray(x), h, bc)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_axis_selection():
    """Stencils act along the requested axis only."""
    x = rnd(4, 6, 5)
    for axis, n in [(0, 4), (1, 6), (2, 5)]:
        want = np.apply_along_axis(lambda v: G.d_lap(n, 1.0, "N") @ v, axis, x)
        got = stencils.lap1d(jnp.asarray(x), 1.0, "N", axis=axis)
        np.testing.assert_allclose(got, want, atol=1e-12)


class Test2D:
    Nx, Ny = 7, 5

    def test_grad2d(self):
        f = rnd(self.Ny, self.Nx)
        for bc in ("N", "D"):
            want = G.grad2d_mat(self.Nx, self.Ny, 1, 1, bc) @ f.ravel()
            got = operators.grad2d(jnp.asarray(f), bc=bc)
            np.testing.assert_allclose(got.reshape(2 * self.Ny * self.Nx),
                                       want, atol=1e-12)

    def test_grad_forward2d(self):
        f = rnd(self.Ny, self.Nx)
        want = G.grad2d_mat(self.Nx, self.Ny, 1, 1, "N", "forward") @ f.ravel()
        got = operators.grad_forward2d(jnp.asarray(f))
        np.testing.assert_allclose(got.reshape(-1), want, atol=1e-12)

    def test_div2d(self):
        u, v = rnd(self.Ny, self.Nx), rnd(self.Ny, self.Nx)
        for bc in ("N", "D"):
            want = G.div2d_mat(self.Nx, self.Ny, 1, 1, bc) @ np.concatenate(
                [u.ravel(), v.ravel()])
            got = operators.div2d(jnp.asarray(u), jnp.asarray(v), bc=bc)
            np.testing.assert_allclose(got.reshape(-1), want, atol=1e-12)

    def test_lap_gn(self):
        f = rnd(self.Ny, self.Nx)
        want = G.lap_gn_mat(self.Nx, self.Ny) @ f.ravel()
        got = operators.lap_gn(jnp.asarray(f))
        np.testing.assert_allclose(got.reshape(-1), want, atol=1e-12)


class TestSpaceTime:
    Nt, Nx, Ny = 4, 6, 5

    def test_grad_st(self):
        phi = rnd(self.Nt, self.Ny, self.Nx)
        want = G.grad_st_mat(self.Nt, self.Nx, self.Ny, 1, 1, 1, "N") @ phi.ravel()
        got = operators.grad_st(jnp.asarray(phi), bc="N")
        np.testing.assert_allclose(got.reshape(-1), want, atol=1e-12)

    def test_div_st(self):
        mu = rnd(3, self.Nt, self.Ny, self.Nx)
        want = G.div_st_mat(self.Nt, self.Nx, self.Ny, 1, 1, 1, "N") @ mu.ravel()
        got = operators.div_st(jnp.asarray(mu), bc="N")
        np.testing.assert_allclose(got.reshape(-1), want, atol=1e-12)

    def test_laplacian_st(self):
        phi = rnd(self.Nt, self.Ny, self.Nx)
        want = G.laplacian_st_mat(self.Nt, self.Nx, self.Ny, 1, 1, 1, "N") @ phi.ravel()
        got = operators.laplacian_st(jnp.asarray(phi), bc="N")
        np.testing.assert_allclose(got.reshape(-1), want, atol=1e-12)

    def test_div_st_is_not_minus_grad_st_T(self):
        """Guard the deliberate quirk (SURVEY.md §2 quirk 3)."""
        A = G.grad_st_mat(self.Nt, self.Nx, self.Ny, 1, 1, 1, "N")
        B = G.div_st_mat(self.Nt, self.Nx, self.Ny, 1, 1, 1, "N")
        assert np.abs(-A.T - B).max() > 1.0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
class TestAgainstReferenceRepo:
    """Compare the dense golden builders against the reference's own scipy
    operators, closing the loop: ours == golden == reference."""

    @classmethod
    def setup_class(cls):
        sys.path.insert(0, REF)
        import importlib
        cls.ref_ops = importlib.import_module("operators")

    @classmethod
    def teardown_class(cls):
        sys.path.remove(REF)

    @pytest.mark.parametrize("h", [1.0, 2.0])
    @pytest.mark.parametrize("bc", ["N", "D"])
    def test_1d(self, h, bc):
        n = 7
        pairs = [
            (G.d_central(n, h, bc), self.ref_ops.grad_1d_central(n, h, bc)),
            (G.d_central(n, h, bc, True), self.ref_ops.grad_1d_central_weird(n, h, bc)),
            (G.d_forward(n, h, bc), self.ref_ops.grad_1d_forward(n, h, bc)),
            (G.d_forward(n, h, bc, True), self.ref_ops.grad_1d_forward_weird(n, h, bc)),
            (G.d_backward(n, h, bc), self.ref_ops.grad_1d_backward(n, h, bc)),
            (G.d_backward(n, h, bc, True), self.ref_ops.grad_1d_backward_weird(n, h, bc)),
            (G.d_lap(n, h, bc), self.ref_ops.lap1d(n, h, bc)),
        ]
        for want, ref in pairs:
            np.testing.assert_allclose(ref.todense(), want, atol=1e-12)

    def test_composites(self):
        Nt, Nx, Ny = 3, 4, 5
        np.testing.assert_allclose(
            self.ref_ops.grad_st(Nt, Nx, Ny, 1, 1, 1, "N").todense(),
            G.grad_st_mat(Nt, Nx, Ny, 1, 1, 1, "N"), atol=1e-12)
        np.testing.assert_allclose(
            self.ref_ops.div_st(Nt, Nx, Ny, 1, 1, 1, "N").todense(),
            G.div_st_mat(Nt, Nx, Ny, 1, 1, 1, "N"), atol=1e-12)
        np.testing.assert_allclose(
            self.ref_ops.laplacian_st(Nt, Nx, Ny, 1, 1, 1, "N").todense(),
            G.laplacian_st_mat(Nt, Nx, Ny, 1, 1, 1, "N"), atol=1e-12)
        np.testing.assert_allclose(
            self.ref_ops.grad(Nx, Ny, 1, 1, "N").todense(),
            G.grad2d_mat(Nx, Ny, 1, 1, "N"), atol=1e-12)
        np.testing.assert_allclose(
            self.ref_ops.div(Nx, Ny, 1, 1, "D").todense(),
            G.div2d_mat(Nx, Ny, 1, 1, "D"), atol=1e-12)
        np.testing.assert_allclose(
            self.ref_ops.grad_forward(Nx, Ny, 1, 1).todense(),
            G.grad2d_mat(Nx, Ny, 1, 1, "N", "forward"), atol=1e-12)
