"""Spectral (DCT) stepA solver: exactness vs the dense operator and vs CG."""

import numpy as np
import pytest
import jax.numpy as jnp

from ofot_tpu.solvers import dct, foto, cg as cg_mod
from ofot_tpu.ops import operators
import golden_ops as G
import fixtures

RNG = np.random.default_rng(41)


def test_dct_roundtrip():
    x = jnp.asarray(RNG.standard_normal((5, 8, 12)))
    np.testing.assert_allclose(np.asarray(dct.idct3(dct.dct3(x))),
                               np.asarray(x), atol=1e-12)


def test_dct_diagonalizes_neumann_laplacian():
    """C L C^T must be diagonal with the claimed eigenvalues."""
    for n in (4, 7, 12):
        L = G.d_lap(n, 1.0, "N")
        C = dct._dct_matrix_np(n)
        D = C @ L @ C.T
        np.testing.assert_allclose(D, np.diag(np.diag(D)), atol=1e-12)
        np.testing.assert_allclose(np.diag(D),
                                   dct._neumann_eigenvalues_np(n), atol=1e-12)


def test_device_generated_matrices_match_host():
    """Large-n on-device cosine matrices (int32 angle reduction) == the
    host f64 matrices to f32 roundoff."""
    for n in (513, 1024):
        dev = np.asarray(dct._dct_matrix_jnp(n, jnp.float32))
        host = dct._dct_matrix_np(n).astype(np.float32)
        assert np.abs(dev - host).max() < 5e-8
        devT = np.asarray(dct._dct_matrix_jnp(n, jnp.float32, transpose=True))
        assert np.abs(devT - host.T).max() < 5e-8


def test_fft_path_matches_matmul_path():
    """The large-axis FFT formulation (Makhoul even extension) must equal
    the orthonormal matmul DCT to roundoff — including odd lengths and the
    full 3-D solve when every axis routes through the FFT."""
    for n in (5, 16, 33, 1025):
        x = jnp.asarray(RNG.standard_normal((3, n)))
        C = dct._dct_matrix_np(n)
        np.testing.assert_allclose(np.asarray(dct._dct_fft_last(x)),
                                   np.asarray(x) @ C.T, atol=1e-11)
        y = jnp.asarray(RNG.standard_normal((3, n)))
        np.testing.assert_allclose(np.asarray(dct._idct_fft_last(y)),
                                   np.asarray(y) @ C, atol=1e-11)

    old = dct._FFT_THRESHOLD
    dct._FFT_THRESHOLD = 4  # force every axis through the FFT path
    try:
        # distinct shape from other tests: solve_stepA_dct is jitted, and a
        # cached trace would bypass the forced threshold
        Nt, Ny, Nx = 4, 6, 10
        r, eps = 1.0, 1e-2
        A = (-r * G.laplacian_st_mat(Nt, Nx, Ny, 1, 1, 1, "N")
             + r * eps * np.eye(Nt * Nx * Ny))
        F = RNG.standard_normal((Nt, Ny, Nx))
        want = np.linalg.solve(A, F.ravel()).reshape(Nt, Ny, Nx)
        got = dct.solve_stepA_dct(jnp.asarray(F), r=r, reg_epsilon=eps)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)
        x2 = jnp.asarray(RNG.standard_normal((7, 11)))
        np.testing.assert_allclose(np.asarray(dct.idct2(dct.dct2(x2))),
                                   np.asarray(x2), atol=1e-12)
    finally:
        dct._FFT_THRESHOLD = old


@pytest.fixture
def fold_enabled():
    """Enable the (default-off) folded solve transforms for one test."""
    old = dct._FOLD_MIN_N
    dct._FOLD_MIN_N = 128
    try:
        yield
    finally:
        dct._FOLD_MIN_N = old


def test_folded_transform_matches_dense_permuted(fold_enabled):
    """The even/odd-split (folded) transform == the dense DCT with
    even-first frequency permutation, both directions — including the
    device-generated matrices (n > 512)."""
    for n in (130, 256, 514):
        assert dct._axis_mode(n) == "fold"
        x = jnp.asarray(RNG.standard_normal((3, n)), jnp.float64)
        C = dct._dct_matrix_np(n)
        perm = np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)])
        want = (np.asarray(x) @ C.T)[:, perm]
        got = dct._apply_axis_folded(x, n, -1, inverse=False)
        tol = 1e-11 if n <= dct._DEVICE_GEN_THRESHOLD else 2e-5
        np.testing.assert_allclose(np.asarray(got), want, atol=tol)
        back = dct._apply_axis_folded(got, n, -1, inverse=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   atol=tol)
        # permuted eigenvalues pair with the folded order
        np.testing.assert_allclose(
            dct._eigs_1d_np(n, "fold"),
            dct._neumann_eigenvalues_np(n)[perm])


def test_stepA_dct_solves_exactly_with_folding(fold_enabled):
    """Spectral solve at a fold-active shape (axes > 128): the result must
    satisfy the exact stencil equation A phi = F."""
    Nt, Ny, Nx = 3, 130, 144
    r, eps = 1.0, 1e-2
    F = jnp.asarray(RNG.standard_normal((Nt, Ny, Nx)))
    # the transform routing is a static part of the solve's jit cache key,
    # so the public entry point is safe to call even though an earlier
    # test traced it with folding off
    modes = dct._solve_modes((Nt, Ny, Nx))
    assert "fold" in modes
    phi = dct.solve_stepA_dct(F, r=r, reg_epsilon=eps)
    residual = (-r * operators.laplacian_st(phi, bc="N") + r * eps * phi
                - F)
    assert float(jnp.max(jnp.abs(residual))) < 1e-8


def test_spectral_preconditioner_folded_equals_natural(fold_enabled):
    """GN's spectral preconditioner through the folded solve-path
    transforms == the same operator through natural-order dct2 (the fold
    is an internal reordering, invisible as a linear operator)."""
    from ofot_tpu.solvers import gn
    k, Ny, Nx = 3, 130, 144
    g = jnp.asarray(RNG.standard_normal((k, Ny, Nx)))
    rhs = jnp.asarray(RNG.standard_normal((k, Ny, Nx)))
    coefs = (0.1, 0.1, 0.2)
    M = gn.make_spectral_block_preconditioner(g, coefs)

    lam = dct.neg_lap2d_spectrum(Ny, Nx, np.float64)
    c = np.mean(np.asarray(g) ** 2, axis=(-2, -1))
    spec = np.asarray(coefs)[:, None, None] * lam[None] + c[:, None, None]
    want = dct.idct2(dct.dct2(rhs) / jnp.asarray(spec))
    np.testing.assert_allclose(np.asarray(M(rhs)), np.asarray(want),
                               atol=1e-10)


def test_stepA_dct_solves_exactly():
    Nt, Ny, Nx = 4, 6, 9
    r, eps = 1.0, 1e-2
    A = (-r * G.laplacian_st_mat(Nt, Nx, Ny, 1, 1, 1, "N")
         + r * eps * np.eye(Nt * Nx * Ny))
    F = RNG.standard_normal((Nt, Ny, Nx))
    want = np.linalg.solve(A, F.ravel()).reshape(Nt, Ny, Nx)
    got = dct.solve_stepA_dct(jnp.asarray(F), r=r, reg_epsilon=eps)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


def test_stepA_dct_precision_option():
    """DCTOps(precision=...) is a distinct, working jit-static ops set:
    the precision threads to the transforms (identical result on CPU,
    where every precision is full f32) and participates in hashing so two
    ops objects with different precisions cannot collide in a jit cache."""
    import jax
    from ofot_tpu.solvers import foto

    F = jnp.asarray(RNG.standard_normal((3, 8, 10)))
    a = dct.solve_stepA_dct(F, r=1.0, reg_epsilon=1e-2)
    b = dct.solve_stepA_dct(F, r=1.0, reg_epsilon=1e-2,
                            precision=jax.lax.Precision.HIGH)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    hi = foto.DCTOps(precision=jax.lax.Precision.HIGH)
    assert hi != foto.DCT_OPS and hash(hi) != hash(foto.DCT_OPS)
    assert foto.DCTOps() == foto.DCT_OPS
    phi, it = hi.stepA_solve(F, 1.0, 1e-2, 1e-6, 100)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(a), atol=1e-12)


def test_dct_matches_cg():
    Nt, Ny, Nx = 5, 10, 14
    r, eps = 1.0, 1e-2
    F = jnp.asarray(RNG.standard_normal((Nt, Ny, Nx)))

    def A(phi):
        return -r * operators.laplacian_st(phi, bc="N") + r * eps * phi

    cg_sol = cg_mod.cg(A, F, rtol=1e-12, maxiter=5000).x
    dct_sol = dct.solve_stepA_dct(F, r=r, reg_epsilon=eps)
    np.testing.assert_allclose(np.asarray(dct_sol), np.asarray(cg_sol),
                               atol=1e-8)


def test_foto_with_dct_matches_cg_path():
    """Full ALG2 with the spectral stepA == the CG stepA (tight tol)."""
    f1, f2 = fixtures.translating_square(20)
    kw = dict(r=1.0, convergence_tol=1e-6, reg_epsilon=1e-2, max_it=8)
    cg_run = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                                  cg_rtol=1e-13, **kw)
    dct_run = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                                   ops=foto.DCT_OPS, **kw)
    np.testing.assert_allclose(np.asarray(dct_run.phi),
                               np.asarray(cg_run.phi), atol=1e-7)
    np.testing.assert_allclose(float(dct_run.crit), float(cg_run.crit),
                               rtol=1e-6)


def test_stepA_dct_refined_matches_exact():
    """Refined solve == exact solve (CPU matmuls are full f32, so this
    pins the operator/spectrum agreement between M and the stencil A —
    a mismatch would leave a refine-proportional residual)."""
    Nt, Ny, Nx = 4, 12, 10
    F = jnp.asarray(RNG.standard_normal((Nt, Ny, Nx)))
    want = dct.solve_stepA_dct(F, r=1.0, reg_epsilon=1e-2)
    for refine in (0, 1, 2):
        got = dct.solve_stepA_dct_refined(F, r=1.0, reg_epsilon=1e-2,
                                          refine=refine)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-10)


def test_stepA_refined_contracts_transform_error():
    """With a deliberately perturbed approximate inverse (standing in for
    bf16 transforms), each refinement step contracts the solve error."""
    Nt, Ny, Nx = 4, 10, 8
    r, eps = 1.0, 1e-2
    F = jnp.asarray(RNG.standard_normal((Nt, Ny, Nx)))
    exact = np.asarray(dct.solve_stepA_dct(F, r=r, reg_epsilon=eps))
    spec = np.asarray(dct._stepA_spectrum_ingraph(
        Nt, Ny, Nx, r, eps, np.float64, ("dense",) * 3))
    pert = spec * (1.0 + 1e-2)          # 1% multiplicative solve error

    def M(b):
        return dct.idct3(dct.dct3(b) / jnp.asarray(pert))

    def A(phi):
        return -r * operators.laplacian_st(phi, bc="N") + r * eps * phi

    phi = M(F)
    errs = [float(jnp.max(jnp.abs(phi - exact)))]
    for _ in range(3):
        phi = phi + M(F - A(phi))
        errs.append(float(jnp.max(jnp.abs(phi - exact))))
    for a, b in zip(errs, errs[1:]):
        assert b < 0.1 * a, errs


def test_foto_with_refined_ops_matches_dct_ops():
    f1, f2 = fixtures.translating_square(20)
    kw = dict(r=1.0, convergence_tol=1e-6, reg_epsilon=1e-2, max_it=8)
    base = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                                ops=foto.DCT_OPS, **kw)
    ref = foto.solve_potential(jnp.asarray(f1), jnp.asarray(f2), 4,
                               ops=foto.DCTRefinedOps(), **kw)
    np.testing.assert_allclose(np.asarray(ref.phi), np.asarray(base.phi),
                               atol=1e-7)
