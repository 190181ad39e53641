"""Direct spectral (DCT) solver for the FOTO stepA system — MXU-native.

The stepA operator ``A = -r * L_st + r*eps*I`` (reference
benamou_brenier.py:203) is built from 1-D Neumann Laplacians whose 'N'
boundary rows are ``[-1, 1]`` (reference operators.py:104-108).  That
matrix is the classic free-boundary discrete Laplacian, diagonalized by the
orthonormal DCT-II basis:

    v_k[i] = c_k * cos(pi * k * (2i+1) / (2n)),   lambda_k = 2 cos(pi k/n) - 2

so the separable space-time operator is diagonal in the tensor-product DCT
basis and stepA solves *exactly* in one forward transform, a pointwise
divide, and one inverse transform — replacing hundreds of CG iterations.

On TPU the transforms are dense (n x n) cosine-matrix contractions: pure
MXU matmuls (n <= a few hundred per axis), which is precisely the hardware's
sweet spot.  The solution matches CG-to-convergence within its tolerance
(tested against the dense operator in tests/test_dct.py); CG remains
available for bitwise-faithful reference semantics (``stepA_solver="cg"``).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=64)
def _dct_matrix_np(n: int) -> np.ndarray:
    """Orthonormal DCT-II analysis matrix C (C @ x = coefficients; the
    inverse transform is C.T)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    C = np.sqrt(2.0 / n) * np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    C[0, :] *= 1.0 / np.sqrt(2.0)
    return C


@lru_cache(maxsize=64)
def _neumann_eigenvalues_np(n: int) -> np.ndarray:
    """Eigenvalues of the 1-D 'N' Laplacian (h = 1) in DCT-II order."""
    k = np.arange(n)
    return 2.0 * np.cos(np.pi * k / n) - 2.0


# Above this size the (n, n) cosine matrix is generated on device instead
# of being baked into the program as a constant (a 3840^2 f32 constant is
# ~59 MB of program blob — brutal for compile time / program shipping).
_DEVICE_GEN_THRESHOLD = 512


def _dct_matrix_jnp(n: int, dtype, transpose: bool = False) -> jnp.ndarray:
    """On-device DCT-II matrix via exact integer angle reduction.

    The angle pi*k*(2i+1)/(2n) grows to ~pi*n, where f32 argument reduction
    in cos() loses ~n*eps radians; reducing k*(2i+1) mod 4n in int32 first
    (exact: products < 2^31 for any practical n) keeps every angle in
    [0, 2*pi) so f32 cos is accurate to ~1e-7 at any n.
    """
    k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    if transpose:
        k, i = i, k
    phase = (k * (2 * i + 1)) % (4 * n)
    ang = (jnp.pi / (2.0 * n)) * phase.astype(dtype)
    C = jnp.sqrt(jnp.asarray(2.0 / n, dtype)) * jnp.cos(ang)
    scale0 = 1.0 / jnp.sqrt(jnp.asarray(2.0, dtype))
    # after the transpose swap, `k` still holds the frequency index, which
    # is the one the DC row scaling follows
    C = jnp.where(k == 0, C * scale0, C)
    # keep the generation at runtime: without the barrier XLA constant-folds
    # the n^2 cos() evaluations in its (slow) compile-time evaluator, which
    # blows compile time up at 4K-sized n
    return jax.lax.optimization_barrier(C)


def _analysis_matrix(n: int, dtype) -> jnp.ndarray:
    if n > _DEVICE_GEN_THRESHOLD:
        return _dct_matrix_jnp(n, dtype)
    return jnp.asarray(_dct_matrix_np(n), dtype)


def _synthesis_matrix(n: int, dtype) -> jnp.ndarray:
    if n > _DEVICE_GEN_THRESHOLD:
        return _dct_matrix_jnp(n, dtype, transpose=True)
    return jnp.asarray(_dct_matrix_np(n).T, dtype)


# Above this axis length the cosine transform runs through an FFT
# (O(n log n)) instead of a dense (n, n) matrix contraction (O(n^2)).
# Backend-dependent, from measurement (BENCHMARKS.md): on TPU the MXU
# matmul beats XLA's FFT even at 1080p/4K axes (18.1 vs 63.5 ms per ALG2
# iteration at 1920x1080 on v5e — TPU FFT is not a first-class op), so the
# FFT path never engages there; on CPU (no MXU) the O(n log n) path wins
# for large axes.  None = decide from jax.default_backend() at trace time;
# tests override with an int to force either path.
_FFT_THRESHOLD: int | None = None


def _fft_threshold() -> int:
    if _FFT_THRESHOLD is not None:
        return _FFT_THRESHOLD
    return 1024 if jax.default_backend() == "cpu" else (1 << 30)


# ------------------------------------------------------- folded transforms
#
# DCT-II even/odd symmetry: C[k, n-1-i] = (-1)^k * C[k, i].  So for even n
# the n x n transform splits into two (n/2 x n/2) matmuls on the folded
# inputs u = x_lo + reverse(x_hi) (even frequencies) and v = x_lo -
# reverse(x_hi) (odd frequencies) — HALF the MXU work.  The catch is the
# output lands in even-first permuted frequency order; a spectral *solve*
# never needs natural order, so the pointwise divide just uses identically
# permuted eigenvalues and the permutation costs nothing (the public
# dct3/idct3 keep natural order and never fold).
#
# MEASURED NEGATIVE (v5e, BENCHMARKS.md): despite the 2x MAC reduction,
# a 1080p A/B gives 6.66 (folded) vs 6.58 ms (dense) per stepA solve —
# TPU matmul operands cannot be fusion outputs, so the u/v fold adds, the
# lane reversal and the output concat each materialize a full field, and
# those ~4 extra HBM passes per folded axis eat the MXU saving exactly.
# Folding is therefore OFF by default (threshold inf) and kept as an
# option for MXU-bound hardware, like the dct-refined solver.

_FOLD_MIN_N = 1 << 30     # set lower (e.g. 128) to enable folding


def _axis_mode(n: int) -> str:
    """Transform route for one axis: 'fft' (large-axis CPU), 'fold'
    (even/odd-split MXU matmuls, solve paths only), or 'dense'."""
    if n > _fft_threshold():
        return "fft"
    if n % 2 == 0 and n > _FOLD_MIN_N:
        return "fold"
    return "dense"


def _solve_modes(ns) -> tuple:
    """Resolve the per-axis transform routes for a spectral solve ONCE.

    Solve paths must use the same route for the spectrum and for the
    transforms (folding permutes the frequency order); resolving at two
    different times (preconditioner construction vs jit trace) lets a
    ``_FOLD_MIN_N`` / ``_FFT_THRESHOLD`` change in between silently
    mismatch them (ADVICE.md r1).  Every solve entry point calls this
    once and threads the result through both."""
    return tuple(_axis_mode(n) for n in ns)


def _folded_matrix_jnp(n: int, dtype, odd: bool) -> jnp.ndarray:
    """On-device (n/2, n/2) even- or odd-frequency half of the DCT-II
    matrix (same exact int32 angle reduction as :func:`_dct_matrix_jnp`)."""
    h = n // 2
    m = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    k = 2 * m + (1 if odd else 0)
    phase = (k * (2 * i + 1)) % (4 * n)
    ang = (jnp.pi / (2.0 * n)) * phase.astype(dtype)
    C = jnp.sqrt(jnp.asarray(2.0 / n, dtype)) * jnp.cos(ang)
    if not odd:
        C = jnp.where(k == 0, C / jnp.sqrt(jnp.asarray(2.0, dtype)), C)
    return jax.lax.optimization_barrier(C)


def _folded_matrices(n: int, dtype):
    """(E, O): rows are the even / odd frequencies of the DCT-II matrix,
    columns restricted to i < n/2 (the symmetric half)."""
    if n > _DEVICE_GEN_THRESHOLD:
        return (_folded_matrix_jnp(n, dtype, odd=False),
                _folded_matrix_jnp(n, dtype, odd=True))
    C = _dct_matrix_np(n)
    h = n // 2
    return jnp.asarray(C[0::2, :h], dtype), jnp.asarray(C[1::2, :h], dtype)


def _apply_axis_folded(x: jnp.ndarray, n: int, axis: int, inverse: bool,
                       precision=None) -> jnp.ndarray:
    """One folded DCT factor; output (forward) / input (inverse) frequency
    order is [k=0,2,..,n-2, 1,3,..,n-1] — pair with :func:`_eigs_1d_np`."""
    h = n // 2
    prec = precision or jax.lax.Precision.HIGHEST
    x = jnp.moveaxis(x, axis, -1)
    E, O = _folded_matrices(n, x.dtype)
    if not inverse:
        lo, hi_r = x[..., :h], x[..., h:][..., ::-1]
        ye = jnp.matmul(lo + hi_r, E.T, preferred_element_type=x.dtype,
                        precision=prec)
        yo = jnp.matmul(lo - hi_r, O.T, preferred_element_type=x.dtype,
                        precision=prec)
        y = jnp.concatenate([ye, yo], axis=-1)
    else:
        a = jnp.matmul(x[..., :h], E, preferred_element_type=x.dtype,
                       precision=prec)
        b = jnp.matmul(x[..., h:], O, preferred_element_type=x.dtype,
                       precision=prec)
        y = jnp.concatenate([a + b, (a - b)[..., ::-1]], axis=-1)
    return jnp.moveaxis(y, -1, axis)


def _eigs_1d_np(n: int, mode: str) -> np.ndarray:
    """1-D Neumann-Laplacian eigenvalues in the order a solve-path
    transform routed as ``mode`` emits them for this axis (permuted
    even-first under 'fold').  ``mode`` comes from the caller's single
    :func:`_solve_modes` resolution — never re-derived here, so spectrum
    and transform cannot disagree."""
    e = _neumann_eigenvalues_np(n)
    if mode == "fold":
        return np.concatenate([e[0::2], e[1::2]])
    return e


def _ortho_scale_np(n: int, dtype) -> np.ndarray:
    """Per-frequency scale mapping the unnormalized DCT-II (2*sum cos) to
    the orthonormal convention used by the matmul path."""
    s = np.full(n, np.sqrt(1.0 / (2.0 * n)))
    s[0] = np.sqrt(1.0 / (4.0 * n))
    return s.astype(dtype)


def _half_shift_np(n: int) -> np.ndarray:
    """exp(-i*pi*k/(2n)) for k = 0..n-1 (the Makhoul half-sample shift)."""
    k = np.arange(n)
    return np.exp(-1j * np.pi * k / (2.0 * n))


def _dct_fft_last(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal DCT-II along the last axis via a length-2n real FFT.

    The even extension w = [x, reverse(x)] has
    ``rfft(w)[k] = exp(i*pi*k/(2n)) * (2 * sum_i x[i] cos(pi k (2i+1)/(2n)))``,
    so one rfft + a pointwise twiddle yields the transform exactly.
    """
    n = x.shape[-1]
    rdtype = x.dtype
    w = jnp.concatenate([x, x[..., ::-1]], axis=-1)
    W = jnp.fft.rfft(w, axis=-1)[..., :n]
    ctype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64
    tw = jnp.asarray(_half_shift_np(n) * _ortho_scale_np(n, np.float64),
                     ctype)
    return (W * tw).real.astype(rdtype)


def _idct_fft_last(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_dct_fft_last` (orthonormal DCT-III)."""
    n = y.shape[-1]
    rdtype = y.dtype
    ctype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64
    # W[k] = exp(i*pi*k/(2n)) * y[k]/s[k] reconstructs rfft of the even
    # extension; W[n] = 0 by the extension's antisymmetry at Nyquist.
    tw = jnp.asarray(np.conj(_half_shift_np(n))
                     / _ortho_scale_np(n, np.float64), ctype)
    W = y.astype(ctype) * tw
    W = jnp.concatenate([W, jnp.zeros(W.shape[:-1] + (1,), ctype)], axis=-1)
    w = jnp.fft.irfft(W, n=2 * n, axis=-1)
    return w[..., :n].astype(rdtype)


def _apply_axis(x: jnp.ndarray, n: int, axis: int, inverse: bool,
                precision=None, mode: str | None = None) -> jnp.ndarray:
    """One separable DCT factor: FFT path for large axes, MXU otherwise.

    ``mode`` is the pre-resolved route from :func:`_solve_modes` (solve
    paths — 'fold' emits coefficients in permuted order, so callers must
    use :func:`_eigs_1d_np` with the same mode for the spectrum).  When
    None (the public natural-order transforms) the route is decided here
    and never folds."""
    if mode is None:
        mode = "fft" if n > _fft_threshold() else "dense"
    if mode == "fft":
        x = jnp.moveaxis(x, axis, -1)
        x = _idct_fft_last(x) if inverse else _dct_fft_last(x)
        return jnp.moveaxis(x, -1, axis)
    if mode == "fold":
        return _apply_axis_folded(x, n, axis, inverse, precision=precision)
    mat = _synthesis_matrix(n, x.dtype) if inverse \
        else _analysis_matrix(n, x.dtype)
    return _transform(x, mat, axis, precision=precision)


def _transform(x: jnp.ndarray, mat: jnp.ndarray, axis: int,
               precision=None) -> jnp.ndarray:
    """Apply an (n, n) transform matrix along one axis of a 3-D field.

    Precision.HIGHEST (the default) is load-bearing on TPU for *solves*:
    the MXU's default matmul precision multiplies in bf16, which degrades
    the cosine transforms to ~1e-2 relative error and stalls ALG2
    convergence around crit~0.4 (observed on v5e); HIGHEST forces full-f32
    (6-pass) multiplication.  Preconditioner applications may pass a lower
    precision — they only need an approximate SPD inverse.
    """
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x, mat.T, preferred_element_type=x.dtype,
                   precision=precision or jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def dct3(x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Separable orthonormal DCT-II over the (Nt, Ny, Nx) axes."""
    Nt, Ny, Nx = x.shape[-3:]
    for axis, n in ((-3, Nt), (-2, Ny), (-1, Nx)):
        x = _apply_axis(x, n, axis, inverse=False, precision=precision)
    return x


def idct3(x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Inverse of :func:`dct3` (transforms are orthonormal)."""
    Nt, Ny, Nx = x.shape[-3:]
    for axis, n in ((-3, Nt), (-2, Ny), (-1, Nx)):
        x = _apply_axis(x, n, axis, inverse=True, precision=precision)
    return x


def _dct3_solve(x: jnp.ndarray, precision=None, modes=None) -> jnp.ndarray:
    """3-D DCT for spectral solves: may fold/FFT-route axes per ``modes``
    (resolved once by the caller via :func:`_solve_modes`; None resolves
    here); coefficient order matches :func:`_eigs_1d_np` per axis."""
    Nt, Ny, Nx = x.shape[-3:]
    modes = modes or _solve_modes((Nt, Ny, Nx))
    for (axis, n), mode in zip(((-3, Nt), (-2, Ny), (-1, Nx)), modes):
        x = _apply_axis(x, n, axis, inverse=False, precision=precision,
                        mode=mode)
    return x


def _idct3_solve(x: jnp.ndarray, precision=None, modes=None) -> jnp.ndarray:
    Nt, Ny, Nx = x.shape[-3:]
    modes = modes or _solve_modes((Nt, Ny, Nx))
    for (axis, n), mode in zip(((-3, Nt), (-2, Ny), (-1, Nx)), modes):
        x = _apply_axis(x, n, axis, inverse=True, precision=precision,
                        mode=mode)
    return x


def stepA_spectrum(Nt: int, Ny: int, Nx: int, r: float, reg_epsilon: float,
                   dtype=np.float32) -> np.ndarray:
    """Eigenvalues of A = -r*L_st + r*eps*I on the DCT-II tensor basis."""
    lt = _neumann_eigenvalues_np(Nt)[:, None, None]
    ly = _neumann_eigenvalues_np(Ny)[None, :, None]
    lx = _neumann_eigenvalues_np(Nx)[None, None, :]
    return (-r * (lt + ly + lx) + r * reg_epsilon).astype(dtype)


def _stepA_spectrum_ingraph(Nt, Ny, Nx, r, reg_epsilon, dtype, modes):
    """In-graph spectrum of ``A = -r*L_st + r*eps*I``: assembled from three
    1-D eigenvalue vectors (a dense (Nt, Ny, Nx) constant would be a
    quarter-GB program blob at 4K resolution); the broadcast add fuses into
    the consuming divide.  Per-axis order matches the solve-path transforms
    routed as ``modes`` (:func:`_eigs_1d_np`: even-first permuted where the
    axis folds)."""
    lt = jnp.asarray(_eigs_1d_np(Nt, modes[0]).astype(dtype))
    ly = jnp.asarray(_eigs_1d_np(Ny, modes[1]).astype(dtype))
    lx = jnp.asarray(_eigs_1d_np(Nx, modes[2]).astype(dtype))
    return (-r * (lt[:, None, None] + ly[None, :, None]
                  + lx[None, None, :]) + r * reg_epsilon)


@partial(jax.jit, static_argnames=("modes", "precision"))
def _solve_stepA_dct(F, r, reg_epsilon, modes, precision=None):
    Nt, Ny, Nx = F.shape[-3:]
    spec = _stepA_spectrum_ingraph(Nt, Ny, Nx, r, reg_epsilon,
                                   np.dtype(F.dtype), modes)
    return _idct3_solve(_dct3_solve(F, modes=modes, precision=precision)
                        / spec, modes=modes, precision=precision)


def solve_stepA_dct(F: jnp.ndarray, r: float = 1.0,
                    reg_epsilon: float = 1e-2,
                    precision=None) -> jnp.ndarray:
    """Exact solve of ``(-r*L_st + r*eps*I) phi = F`` via 3-D DCT.

    ``r`` and ``reg_epsilon`` are traced (NOT static): callers like
    ``foto.solve_potential`` pass them as jit-traced scalars, and a traced
    value in a static argname poisons the jit cache key (the second call
    with a fresh tracer fails the cache-key equality check).  The per-axis
    transform routes ARE static: resolved once here and part of the jit
    cache key, so toggling ``_FOLD_MIN_N`` / ``_FFT_THRESHOLD`` recompiles
    instead of silently reusing the other routing's cache (ADVICE.md r1).

    ``precision``: matmul precision of the transforms (None = HIGHEST,
    the accuracy the ALG2 convergence analysis in ``_transform`` needs;
    see ``DCTOps(precision=...)`` for the measured trade-offs).
    """
    modes = _solve_modes(F.shape[-3:])
    return _solve_stepA_dct(F, r, reg_epsilon, modes, precision)


def solve_stepA_dct_refined(F: jnp.ndarray, r=1.0, reg_epsilon=1e-2,
                            refine: int = 3, precision=None):
    """Spectral stepA with *low-precision* MXU transforms plus ``refine``
    steps of f32 iterative refinement.

    ``Precision.HIGHEST`` costs 6 bf16 MXU passes per matmul.  Here the
    transforms run at ``precision`` (None -> DEFAULT = one bf16 pass) and
    the accuracy is recovered by classic iterative refinement against the
    exact f32 stencil operator ``A = -r*L_st + r*eps*I``:

        phi  = M(F)                       # approximate spectral inverse
        phi += M(F - A(phi))  x refine    # residual via cheap f32 stencil

    Each refinement contracts the solve error by roughly the transform's
    relative error amplified by the operator's conditioning.  Measured on
    a real v5e at the production config (320x240, Nt=16, 200 ALG2 iters,
    BENCHMARKS.md): bf16 needs ``refine=3`` to reach the production
    convergence tolerance (crit 0.0096 vs HIGHEST's 0.0098; refine=1/2
    stall at 0.031/0.015) — hence the default.  At (1+3)/6 of the
    HIGHEST-precision MXU work this only pays off where the transforms
    dominate the iteration (very large grids); at the production shape it
    measured 0.57 vs 0.53 ms/iter, so HIGHEST stays the default solver.
    Validated in tests/test_dct.py.
    """
    from ofot_tpu.ops import operators

    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    Nt, Ny, Nx = F.shape[-3:]
    modes = _solve_modes((Nt, Ny, Nx))
    spec = _stepA_spectrum_ingraph(Nt, Ny, Nx, r, reg_epsilon,
                                   np.dtype(F.dtype), modes)

    def M(b):
        return _idct3_solve(_dct3_solve(b, precision=precision,
                                        modes=modes) / spec,
                            precision=precision, modes=modes)

    def A(phi):
        return -r * operators.laplacian_st(phi, bc="N") \
            + (r * reg_epsilon) * phi

    phi = M(F)
    for _ in range(refine):
        phi = phi + M(F - A(phi))
    return phi


# ----------------------------------------------------------- 2-D (GN) case

def dct2(x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Separable orthonormal DCT-II over the trailing (Ny, Nx) axes."""
    Ny, Nx = x.shape[-2:]
    x = _apply_axis(x, Ny, -2, inverse=False, precision=precision)
    return _apply_axis(x, Nx, -1, inverse=False, precision=precision)


def idct2(x: jnp.ndarray, precision=None) -> jnp.ndarray:
    Ny, Nx = x.shape[-2:]
    x = _apply_axis(x, Ny, -2, inverse=True, precision=precision)
    return _apply_axis(x, Nx, -1, inverse=True, precision=precision)


def _dct2_solve(x: jnp.ndarray, precision=None, modes=None) -> jnp.ndarray:
    """2-D DCT for spectral solves (may fold/FFT-route per ``modes``, the
    caller's single :func:`_solve_modes` resolution); coefficient order
    matches :func:`neg_lap2d_spectrum_solve` for the same modes."""
    Ny, Nx = x.shape[-2:]
    modes = modes or _solve_modes((Ny, Nx))
    x = _apply_axis(x, Ny, -2, inverse=False, precision=precision,
                    mode=modes[0])
    return _apply_axis(x, Nx, -1, inverse=False, precision=precision,
                       mode=modes[1])


def _idct2_solve(x: jnp.ndarray, precision=None, modes=None) -> jnp.ndarray:
    Ny, Nx = x.shape[-2:]
    modes = modes or _solve_modes((Ny, Nx))
    x = _apply_axis(x, Ny, -2, inverse=True, precision=precision,
                    mode=modes[0])
    return _apply_axis(x, Nx, -1, inverse=True, precision=precision,
                       mode=modes[1])


def neg_lap2d_spectrum_solve(Ny: int, Nx: int, dtype=np.float64,
                             modes=None) -> np.ndarray:
    """:func:`neg_lap2d_spectrum` in the per-axis order emitted by the
    solve-path transforms (:func:`_dct2_solve`) routed as ``modes``."""
    modes = modes or _solve_modes((Ny, Nx))
    ly = -_eigs_1d_np(Ny, modes[0])[:, None]
    lx = -_eigs_1d_np(Nx, modes[1])[None, :]
    return (ly + lx).astype(dtype)


def neg_lap2d_spectrum(Ny: int, Nx: int, dtype=np.float64) -> np.ndarray:
    """Eigenvalues of ``-lap_gn`` (= Dx^T Dx + Dy^T Dy with forward/'N'
    differences, reference classical.py:102-104) on the 2-D DCT-II basis.

    D^T D for the forward/'N' scheme is exactly the free-boundary Neumann
    Laplacian (negated), so its eigenvalues are ``2 - 2 cos(pi k/n)`` per
    axis (verified against the dense operator in tests/test_dct.py)."""
    ly = -_neumann_eigenvalues_np(Ny)[:, None]
    lx = -_neumann_eigenvalues_np(Nx)[None, :]
    return (ly + lx).astype(dtype)
