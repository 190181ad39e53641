"""Matrix-free 2-D and space-time (3-D) differential operators.

Equivalents (by action, not by construction) of the reference's sparse-kron
operators (reference operators.py:114-191).  Field layout conventions — which
mirror the reference's flat row-major indexing exactly:

  * spatial fields are ``(Ny, Nx)`` arrays: x (image column) along axis -1
    (reference ``kron(Iy, Dx)``), y (image row) along axis -2
    (``kron(Dy, Ix)``);
  * space-time fields are ``(Nt, Ny, Nx)`` arrays with time on axis 0
    (``kron(Dt, Ixy)``);
  * vector fields carry the component axis first: ``(2, Ny, Nx)`` or
    ``(3, Nt, Ny, Nx)`` — matching the reference's component-outermost flat
    stacking (reference benamou_brenier.py:191-194).

The space-time operators use the ``grad_central_weird`` stencil exactly like
the reference's ``grad_st``/``div_st`` (reference operators.py:114-142), and
``laplacian_st`` is the independently-built 7-point Laplacian — deliberately
NOT ``div_st @ grad_st`` (SURVEY.md §2 quirk 3; reference
benamou_brenier.py:198-201).
"""

from __future__ import annotations

import jax.numpy as jnp

from ofot_tpu.ops import stencils

# axis conventions
_AX_X = -1   # image column
_AX_Y = -2   # image row
_AX_T = -3   # time (space-time fields only)


# --------------------------------------------------------------------------
# spatial (2-D) operators — reference operators.py:160-191
# --------------------------------------------------------------------------

def grad2d(f, dx=1.0, dy=1.0, bc="N"):
    """Central-difference spatial gradient -> (2, ..., Ny, Nx) = (d/dx, d/dy).

    Matches the action of reference ``operators.grad`` (operators.py:160-169):
    with bc='N' the boundary rows are zero, so the gradient vanishes on the
    image border (SURVEY.md §2 quirk 2).
    """
    gx = stencils.grad_central(f, dx, bc, axis=_AX_X)
    gy = stencils.grad_central(f, dy, bc, axis=_AX_Y)
    return jnp.stack([gx, gy])


def grad_forward2d(f, dx=1.0, dy=1.0, bc="N"):
    """Forward-difference spatial gradient -> (2, ..., Ny, Nx).

    Matches reference ``operators.grad_forward`` (operators.py:171-180)."""
    gx = stencils.grad_forward(f, dx, bc, axis=_AX_X)
    gy = stencils.grad_forward(f, dy, bc, axis=_AX_Y)
    return jnp.stack([gx, gy])


def div2d(u, v, dx=1.0, dy=1.0, bc="N"):
    """Central-difference divergence of (u, v) -> (..., Ny, Nx).

    Matches reference ``operators.div`` (operators.py:182-191): the row-block
    ``[kron(Iy,Dx), kron(Dy,Ix)]`` applied to the stacked (u, v)."""
    return (stencils.grad_central(u, dx, bc, axis=_AX_X)
            + stencils.grad_central(v, dy, bc, axis=_AX_Y))


def div_forward_adjoint2d(u, v, dx=1.0, dy=1.0, bc="N"):
    """``div = -grad_forward^T`` applied to (u, v), as the GN solver builds it
    (reference classical.py:102-103)."""
    return -(stencils.grad_forward_adjoint(u, dx, bc, axis=_AX_X)
             + stencils.grad_forward_adjoint(v, dy, bc, axis=_AX_Y))


def lap_gn(f, dx=1.0, dy=1.0, bc="N"):
    """GN smoothness Laplacian ``lap = div @ grad = -grad_forward^T grad_forward``
    (reference classical.py:102-104), applied matrix-free."""
    gx = stencils.grad_forward(f, dx, bc, axis=_AX_X)
    gy = stencils.grad_forward(f, dy, bc, axis=_AX_Y)
    return div_forward_adjoint2d(gx, gy, dx, dy, bc)


# --------------------------------------------------------------------------
# space-time (3-D) operators — reference operators.py:114-157
# --------------------------------------------------------------------------

def grad_st(phi, dt=1.0, dx=1.0, dy=1.0, bc="N"):
    """Space-time gradient -> (3, Nt, Ny, Nx) = (d/dt, d/dx, d/dy).

    Component order matches the reference's row blocks [t; x; y]
    (reference operators.py:124-127); all three use the ``central_weird``
    stencil."""
    gt = stencils.grad_central_weird(phi, dt, bc, axis=_AX_T)
    gx = stencils.grad_central_weird(phi, dx, bc, axis=_AX_X)
    gy = stencils.grad_central_weird(phi, dy, bc, axis=_AX_Y)
    return jnp.stack([gt, gx, gy])


def div_st(mu, dt=1.0, dx=1.0, dy=1.0, bc="N"):
    """Space-time divergence of ``mu = (rho, m1, m2)`` stacked on axis 0
    -> (Nt, Ny, Nx).

    NOTE: this is the reference's independently-built ``div_st``
    (operators.py:129-142), which is *not* ``-grad_st^T``
    (SURVEY.md §2 quirk 3)."""
    rho, m1, m2 = mu[0], mu[1], mu[2]
    return (stencils.grad_central_weird(rho, dt, bc, axis=_AX_T)
            + stencils.grad_central_weird(m1, dx, bc, axis=_AX_X)
            + stencils.grad_central_weird(m2, dy, bc, axis=_AX_Y))


def laplacian_st(phi, dt=1.0, dx=1.0, dy=1.0, bc="N"):
    """7-point space-time Laplacian ``Lt + Lx + Ly`` -> (Nt, Ny, Nx)
    (reference operators.py:144-157)."""
    return (stencils.lap1d(phi, dt, bc, axis=_AX_T)
            + stencils.lap1d(phi, dx, bc, axis=_AX_X)
            + stencils.lap1d(phi, dy, bc, axis=_AX_Y))
