"""Implicit differentiation through the variational solves.

Framework extension: the GN/HS solutions are defined by SPD linear systems
``A(theta) x = b(theta)``; differentiating *through* hundreds of CG
iterations would be wasteful and memory-hungry (and `lax.while_loop` is not
reverse-differentiable anyway).  The implicit-function theorem gives the
exact adjoint instead:

    dL/dtheta = - (d r / d theta)^T w,   with  A^T w = dL/dx,  A^T = A

so the backward pass is ONE more CG solve plus a VJP of the residual
``r(theta) = A(theta) x - b(theta)`` at the fixed primal solution.  This
makes the optical-flow solvers usable as differentiable layers (e.g. tuning
alpha/lambda against EPE, or backprop into upstream image models).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ofot_tpu.solvers.cg import cg


def _gn_system(f1, f2, alpha, lambda_):
    """(A-action, b, M) for GN parameterized by (f1, f2, alpha, lambda)."""
    from ofot_tpu.solvers import gn

    A, _ = gn.make_operator(f2, alpha, lambda_)
    fx, fy = gn.image_gradients(f2)
    ft = f2 - f1
    b = jnp.stack([-fx * ft, -fy * ft, f2 * ft])
    M = gn.make_spectral_preconditioner(f2, alpha, lambda_)
    return A, b, M


def _residual(theta, x):
    f1, f2, alpha, lambda_ = theta
    A, b, _ = _gn_system(f1, f2, alpha, lambda_)
    return A(x) - b


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gn_solve_implicit(f1, f2, alpha, lambda_, rtol=1e-10, maxiter=5000):
    """Differentiable GN solve -> x = (u, v, m) stacked (3, Ny, Nx).

    Gradients w.r.t. all four arguments flow through the implicit adjoint.
    """
    A, b, M = _gn_system(f1, f2, alpha, lambda_)
    return cg(A, b, rtol=rtol, maxiter=maxiter, M=M).x


def _fwd(f1, f2, alpha, lambda_, rtol, maxiter):
    x = gn_solve_implicit(f1, f2, alpha, lambda_, rtol, maxiter)
    return x, (f1, f2, alpha, lambda_, x)


def _bwd(rtol, maxiter, res, g):
    f1, f2, alpha, lambda_, x = res
    A, _, M = _gn_system(f1, f2, alpha, lambda_)
    w = cg(A, g, rtol=rtol, maxiter=maxiter, M=M).x      # A^T w = g, A SPD
    theta = (f1, f2, jnp.asarray(alpha), jnp.asarray(lambda_))
    _, vjp = jax.vjp(lambda th: _residual(th, x), theta)
    (d_f1, d_f2, d_alpha, d_lambda), = vjp(-w)
    return d_f1, d_f2, d_alpha, d_lambda


gn_solve_implicit.defvjp(_fwd, _bwd)
