"""Implicit differentiation: adjoint gradients vs finite differences."""

import numpy as np
import jax
import jax.numpy as jnp

from ofot_tpu.solvers.implicit import gn_solve_implicit
import fixtures


def test_primal_matches_direct_solve():
    from ofot_tpu.solvers import gn
    f1, f2 = fixtures.smooth_blob_pair(10, 12)
    x = gn_solve_implicit(jnp.asarray(f1), jnp.asarray(f2), 0.1, 0.2)
    r = gn.solve_fields(jnp.asarray(f1), jnp.asarray(f2), 0.1, 0.2)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(r.u), atol=1e-8)


def test_grad_wrt_alpha_matches_fd():
    f1, f2 = fixtures.smooth_blob_pair(10, 12)
    f1j, f2j = jnp.asarray(f1), jnp.asarray(f2)

    def loss(alpha):
        x = gn_solve_implicit(f1j, f2j, alpha, 0.2)
        return jnp.sum(x[0] ** 2 + x[1] ** 2)

    g = jax.grad(loss)(0.1)
    eps = 1e-6
    fd = (loss(0.1 + eps) - loss(0.1 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


def test_grad_wrt_image_matches_fd():
    f1, f2 = fixtures.smooth_blob_pair(8, 9)
    f1j, f2j = jnp.asarray(f1), jnp.asarray(f2)

    def loss(f1v):
        x = gn_solve_implicit(f1v, f2j, 0.1, 0.2)
        return jnp.sum(x[0] * x[1]) + jnp.sum(x[2] ** 2)

    g = np.asarray(jax.grad(loss)(f1j))
    eps = 1e-6
    rng = np.random.default_rng(5)
    for _ in range(3):
        i, j = rng.integers(0, 8), rng.integers(0, 9)
        d = np.zeros_like(f1)
        d[i, j] = eps
        fd = (float(loss(jnp.asarray(f1 + d)))
              - float(loss(jnp.asarray(f1 - d)))) / (2 * eps)
        # FD truncation + CG-tolerance noise bound the agreement
        np.testing.assert_allclose(g[i, j], fd, rtol=5e-3, atol=1e-5)
