"""Gennert–Negahdaripour (GN) variational optical flow with luminosity.

TPU-native re-design of the reference's ``classical.GLLOpticalFlow``
(reference classical.py:25-130).  The reference assembles a 3(wh) x 3(wh)
sparse block system and calls a direct sparse LU (``spsolve``,
classical.py:126) — 10+ seconds at 320x240 on CPU (SURVEY.md §6).  Here the
same normal-equations operator is applied matrix-free (two stencils + nine
pointwise multiplies per application) and solved with block-Jacobi
preconditioned CG, fully jitted.

System (SURVEY.md §2 C5), unknowns x = (u, v, m), each (Ny, Nx):

    [ -a*L + fx^2    fx*fy         -fx*f2  ] [u]   [ -fx*ft ]
    [ fy*fx          -a*L + fy^2   -fy*f2  ] [v] = [ -fy*ft ]
    [ -f2*fx         -f2*fy        -l*L+f2^2] [m]  [  f2*ft ]

with L = div @ grad = -grad_forward^T grad_forward (Neumann), fx/fy interior
central differences of **f2** with zeroed borders (classical.py:90-98), and
ft = f2 - f1 (classical.py:100).  The operator is symmetric positive
definite: the data part is the rank-1 outer product g g^T with
g = (fx, fy, -f2), the smoothness part is a*G^T G (+ l*G^T G).

Preconditioner: the exact per-pixel 3x3 block of the operator's diagonal —
diag of -a*L plus g g^T — inverted in closed form via Sherman–Morrison.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ofot_tpu.ops import operators, stencils
from ofot_tpu.solvers.cg import cg, CGResult


class GNResult(NamedTuple):
    u: jnp.ndarray
    v: jnp.ndarray
    m: jnp.ndarray
    cg: CGResult


def image_gradients(f2: jnp.ndarray):
    """fx, fy: interior central differences of f2, zero on the border —
    identical in action to reference classical.py:90-98."""
    fx = stencils.grad_central(f2, 1.0, "N", axis=-1)
    fy = stencils.grad_central(f2, 1.0, "N", axis=-2)
    return fx, fy


def _lap_diag(Ny: int, Nx: int, dtype) -> jnp.ndarray:
    """Diagonal of ``-lap_gn`` = diag(G^T G) for the forward/'N' gradient:
    2 per axis in the interior, 1 on the first/last line of that axis."""
    dx = jnp.full((Nx,), 2.0, dtype).at[0].set(1.0).at[-1].set(1.0)
    dy = jnp.full((Ny,), 2.0, dtype).at[0].set(1.0).at[-1].set(1.0)
    return dx[None, :] + dy[:, None]


def make_operator(f2, alpha, lambda_):
    """Returns (A, M): the block operator action on (3, Ny, Nx) arrays and
    its Sherman–Morrison block-Jacobi preconditioner."""
    fx, fy = image_gradients(f2)
    g = jnp.stack([fx, fy, -f2])          # rank-1 data direction per pixel

    def A(x):
        u, v, m = x[0], x[1], x[2]
        smooth = jnp.stack([
            -alpha * operators.lap_gn(u),
            -alpha * operators.lap_gn(v),
            -lambda_ * operators.lap_gn(m),
        ])
        data = g * (g[0] * u + g[1] * v + g[2] * m)[None]
        return smooth + data

    Ny, Nx = f2.shape
    ld = _lap_diag(Ny, Nx, f2.dtype)
    d = jnp.stack([alpha * ld, alpha * ld, lambda_ * ld])   # diag of smooth part
    return A, make_jacobi_block_preconditioner(g, d)


def make_jacobi_block_preconditioner(g, d):
    """Shared pointwise Sherman–Morrison block-Jacobi preconditioner for
    the GN/Horn–Schunck normal equations: per pixel, the exact inverse of
    ``diag(d) + g g^T`` (k x k, rank-1 data block on the smoothness
    diagonal ``d``)."""
    dinv = 1.0 / d
    denom = 1.0 + jnp.sum(g * g * dinv, axis=0)

    def M(rhs):
        # (D + g g^T)^-1 = D^-1 - D^-1 g g^T D^-1 / (1 + g^T D^-1 g)
        t = jnp.sum(g * dinv * rhs, axis=0)
        return dinv * rhs - dinv * g * (t / denom)[None]

    return M


def make_spectral_block_preconditioner(g, coefs, precision=None):
    """Shared k-component spectral (DCT) preconditioner used by the GN and
    Horn–Schunck solvers: per component i, the exact inverse of
    ``coefs[i] * (-L) + mean(g_i^2) * I`` in the 2-D DCT-II basis.

    ``g`` is the (k, Ny, Nx) per-pixel data direction; ``coefs`` the k
    smoothness weights.  Entries where the spectrum is exactly zero — the
    DC mode of a component whose data term vanishes identically, e.g.
    fx == 0 for frames constant along x — act as identity instead of
    producing 0/0 = NaN (the operator itself is singular there and the
    corresponding rhs component is zero, so CG never excites the mode)."""
    from ofot_tpu.solvers import dct as dct_mod

    k, Ny, Nx = g.shape
    # transform routing (fold/fft/dense per axis) is resolved ONCE here
    # and threaded to both the spectrum and the transforms, so a later
    # change of dct._FOLD_MIN_N / _FFT_THRESHOLD cannot mismatch their
    # frequency orders (ADVICE.md r1)
    modes = dct_mod._solve_modes((Ny, Nx))
    lam = jnp.asarray(dct_mod.neg_lap2d_spectrum_solve(
        Ny, Nx, np.dtype(g.dtype), modes=modes))
    coef = jnp.stack([jnp.full((), c, g.dtype) for c in coefs])
    c = jnp.mean(g * g, axis=(-2, -1))            # mean data diagonal
    spec = coef[:, None, None] * lam[None] + c[:, None, None]
    spec = jnp.where(spec == 0, jnp.ones((), g.dtype), spec)

    def M(rhs):
        return dct_mod._idct2_solve(
            dct_mod._dct2_solve(rhs, precision=precision, modes=modes)
            / spec,
            precision=precision, modes=modes)

    return M


def make_spectral_preconditioner(f2, alpha, lambda_, precision=None):
    """Spectral (DCT) preconditioner: exact inverse of the smoothness
    operator plus the *mean* data diagonal, per component.

    ``-lap_gn`` is diagonal in the 2-D DCT-II basis
    (ofot_tpu/solvers/dct.py), so M^-1 = blockdiag over components of
    ``(alpha_i * (-L) + c_i I)^-1`` costs 4 MXU matmuls per component and
    removes the Laplacian's long-wavelength ill-conditioning that the
    pointwise block-Jacobi preconditioner cannot touch.

    ``precision``: matmul precision of the transforms.  A preconditioner
    only needs an approximate inverse, so bf16 (Precision.DEFAULT) is
    usable — measured on v5e at 320x240: 166 vs 153 CG iterations but
    ~10% lower wall (26.7 vs 29.8 ms), solutions equal to 5e-6.  Default
    stays HIGHEST: bf16 rounding makes M very slightly non-symmetric,
    which standard PCG theory does not cover, and the gain is small."""
    fx, fy = image_gradients(f2)
    g = jnp.stack([fx, fy, -f2])
    return make_spectral_block_preconditioner(
        g, (alpha, alpha, lambda_), precision=precision)


@partial(jax.jit, static_argnames=("maxiter", "precond"))
def solve_fields(f1, f2, alpha=0.1, lambda_=0.2, rtol=1e-10, maxiter=5000,
                 precond="spectral"):
    """Solve the GN system; returns GNResult of (Ny, Nx) fields.

    ``precond``: "spectral" (DCT inverse of smoothness + mean data — a few
    dozen CG iterations) or "jacobi" (pointwise Sherman–Morrison 3x3
    blocks).  Defaults are tight enough that the solution matches the
    reference's direct spsolve within the AEPE <= 0.05 parity budget
    (validated in tests/test_gn.py).
    """
    f1 = jnp.asarray(f1)
    f2 = jnp.asarray(f2)
    fx, fy = image_gradients(f2)
    ft = f2 - f1

    A, M_jac = make_operator(f2, alpha, lambda_)
    M = (make_spectral_preconditioner(f2, alpha, lambda_)
         if precond == "spectral" else M_jac)
    b = jnp.stack([-fx * ft, -fy * ft, f2 * ft])

    res = cg(A, b, rtol=rtol, maxiter=maxiter, M=M)
    x = res.x
    return GNResult(u=x[0], v=x[1], m=x[2], cg=res)


class GLLOpticalFlow:
    """Drop-in familiar API mirroring the reference class
    (reference classical.py:25-130): ``assemble(f1, f2)`` then
    ``process() -> [u, v, m]`` on flat arrays."""

    NAME = "GLL"
    LUMINOSITY = True

    def __init__(self, w=0, h=0):
        self.w = w
        self.h = h
        self.alpha = 0.1
        self.lambdap = 0.2

    def setAlpha(self, alpha):
        self.alpha = alpha

    def setLambda(self, lambdap):
        self.lambdap = lambdap

    def assemble(self, f1, f2):
        self._f1 = jnp.asarray(f1).reshape(self.h, self.w)
        self._f2 = jnp.asarray(f2).reshape(self.h, self.w)
        return self

    def process(self):
        r = solve_fields(self._f1, self._f2, self.alpha, self.lambdap)
        import numpy as np
        return [np.asarray(r.u).ravel(), np.asarray(r.v).ravel(),
                np.asarray(r.m).ravel()]
