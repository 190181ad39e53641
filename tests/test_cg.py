"""CG core: correctness vs dense solve and scipy-matching semantics."""

import numpy as np
import scipy.sparse.linalg as spla
import jax.numpy as jnp

from ofot_tpu.solvers.cg import cg
from ofot_tpu.ops import operators

RNG = np.random.default_rng(3)


def test_cg_small_spd():
    n = 40
    Q = RNG.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = RNG.standard_normal(n)
    res = cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), rtol=1e-12,
             maxiter=500)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               atol=1e-8)
    assert bool(res.converged)


def test_cg_matches_scipy_on_st_laplacian():
    """Same operator/rhs/tolerances as the reference's stepA solve."""
    Nt, Ny, Nx = 4, 8, 6
    r, eps = 1.0, 1e-2

    def A(phi):
        return -r * operators.laplacian_st(phi, bc="N") + r * eps * phi

    import golden_ops as G
    A_dense = -r * G.laplacian_st_mat(Nt, Nx, Ny, 1, 1, 1, "N") + \
        r * eps * np.eye(Nt * Nx * Ny)

    b = RNG.standard_normal((Nt, Ny, Nx))
    x_scipy, info = spla.cg(A_dense, b.ravel(), rtol=1e-6, maxiter=1000)
    assert info == 0
    res = cg(A, jnp.asarray(b), rtol=1e-6, maxiter=1000)
    # both converged to the same tolerance on the same system
    np.testing.assert_allclose(np.asarray(res.x).ravel(), x_scipy,
                               atol=5e-5)
    assert bool(res.converged)


def test_cg_maxiter_cap():
    n = 50
    A = np.diag(np.linspace(1, 1e6, n))   # terribly conditioned
    b = np.ones(n)
    res = cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), rtol=1e-14,
             maxiter=3)
    assert int(res.iterations) == 3
    assert not bool(res.converged)


def test_cg_preconditioned_faster():
    n = 64
    d = np.linspace(1.0, 1e4, n)
    A_op = lambda x: jnp.asarray(d) * x
    b = jnp.asarray(RNG.standard_normal(n))
    plain = cg(A_op, b, rtol=1e-10, maxiter=1000)
    prec = cg(A_op, b, rtol=1e-10, maxiter=1000,
              M=lambda x: x / jnp.asarray(d))
    assert int(prec.iterations) < int(plain.iterations)
    np.testing.assert_allclose(np.asarray(prec.x), np.asarray(b) / d,
                               atol=1e-9)
