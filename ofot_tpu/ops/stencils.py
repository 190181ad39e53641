"""Matrix-free 1-D finite-difference stencils.

Each function applies, along one axis of an N-D array, the action of one of
the reference's 1-D sparse operators (reference operators.py:5-110) —
including their exact boundary-condition quirks, which are parity-critical
(SURVEY.md §2 quirks 1-3):

  * ``grad_central`` with bc='N' has *zeroed* boundary rows
    (reference operators.py:61-63);
  * the ``*_weird`` variants overwrite boundary rows with one-sided
    differences that are **not** divided by h (set after ``L /= h``,
    reference operators.py:42-46);
  * bc='D' keeps the truncated interior stencil at the boundary (the
    ghost value outside the domain is implicitly 0).

All functions are pure jnp and jit-friendly: static shapes, no Python
branching on traced values.  ``axis`` selects the grid dimension the stencil
runs along; boundary handling uses static ``.at[]`` updates which XLA fuses.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _shifted(f: jnp.ndarray, offset: int, axis: int) -> jnp.ndarray:
    """out[i] = f[i + offset] along ``axis``, zero beyond the boundary."""
    if offset == 0:
        return f
    n = f.shape[axis]
    pad = [(0, 0)] * f.ndim
    if offset > 0:
        pad[axis] = (0, offset)
        return lax.slice_in_dim(jnp.pad(f, pad), offset, offset + n, axis=axis)
    pad[axis] = (-offset, 0)
    return lax.slice_in_dim(jnp.pad(f, pad), 0, n, axis=axis)


def _index(f: jnp.ndarray, i: int, axis: int) -> jnp.ndarray:
    """Slice index ``i`` along ``axis`` (keeps the axis with size 1 dropped)."""
    idx = [slice(None)] * f.ndim
    idx[axis] = i
    return f[tuple(idx)]


def _set(f: jnp.ndarray, i: int, axis: int, value) -> jnp.ndarray:
    """Overwrite row ``i`` along ``axis`` with ``value`` as a masked select.

    Expressed as iota==i + where (not ``.at[].set``): a dynamic-update-slice
    costs a full read+write pass of the array on TPU (profiled at ~19% of
    an ALG2 iteration across the stencil boundary rows), while the select
    fuses into whatever pass produces ``f``.
    """
    ax = axis % f.ndim
    pos = lax.broadcasted_iota(jnp.int32, f.shape, ax)
    v = jnp.asarray(value, f.dtype)
    if v.ndim == f.ndim - 1:
        v = jnp.expand_dims(v, ax)
    return jnp.where(pos == i % f.shape[ax], v, f)


def _check_bc(bc: str) -> None:
    if bc not in ("N", "D"):
        raise NotImplementedError(
            "These boundary conditions are not implemented"
        )


# --------------------------------------------------------------------------
# standard FD schemes (reference operators.py:52-110)
# --------------------------------------------------------------------------

def grad_central(f, h, bc, axis=-1):
    """Central difference (f[i+1]-f[i-1])/(2h).

    bc='N': boundary rows are identically zero (reference operators.py:61-63).
    bc='D': truncated central stencil at the boundary.
    """
    _check_bc(bc)
    out = (_shifted(f, 1, axis) - _shifted(f, -1, axis)) / (2.0 * h)
    if bc == "N":
        out = _set(out, 0, axis, 0.0)
        out = _set(out, -1, axis, 0.0)
    return out


def grad_forward(f, h, bc="N", axis=-1):
    """Forward difference (f[i+1]-f[i])/h.

    bc='N': last row zero (reference operators.py:76-77).
    bc='D': last row is -f[n-1]/h.
    """
    _check_bc(bc)
    out = (_shifted(f, 1, axis) - f) / h
    if bc == "N":
        out = _set(out, -1, axis, 0.0)
    return out


def grad_backward(f, h, bc="N", axis=-1):
    """Backward difference (f[i]-f[i-1])/h.

    bc='N': first row zero (reference operators.py:90-91).
    bc='D': first row is f[0]/h.
    """
    _check_bc(bc)
    out = (f - _shifted(f, -1, axis)) / h
    if bc == "N":
        out = _set(out, 0, axis, 0.0)
    return out


def lap1d(f, h, bc, axis=-1):
    """Three-point Laplacian (f[i-1]-2f[i]+f[i+1])/h^2.

    bc='N': boundary rows (-f[0]+f[1])/h^2 and (f[n-2]-f[n-1])/h^2
    (reference operators.py:104-108).  bc='D': truncated stencil.
    """
    _check_bc(bc)
    h2 = h * h
    out = (_shifted(f, 1, axis) - 2.0 * f + _shifted(f, -1, axis)) / h2
    if bc == "N":
        out = _set(out, 0, axis,
                   (-_index(f, 0, axis) + _index(f, 1, axis)) / h2)
        out = _set(out, -1, axis,
                   (-_index(f, -1, axis) + _index(f, -2, axis)) / h2)
    return out


# --------------------------------------------------------------------------
# "weird" variants (reference operators.py:5-48): boundary rows overwritten
# with one-sided differences NOT divided by h.
# --------------------------------------------------------------------------

def grad_central_weird(f, h, bc, axis=-1):
    """Central difference whose bc='N' boundary rows are the *unscaled*
    one-sided differences f[1]-f[0] / f[n-1]-f[n-2]
    (reference operators.py:42-46; SURVEY.md §2 quirk 1).
    bc='D' is the truncated central stencil.
    """
    _check_bc(bc)
    out = (_shifted(f, 1, axis) - _shifted(f, -1, axis)) / (2.0 * h)
    if bc == "N":
        out = _set(out, 0, axis, _index(f, 1, axis) - _index(f, 0, axis))
        out = _set(out, -1, axis, _index(f, -1, axis) - _index(f, -2, axis))
    return out


def grad_forward_weird(f, h, bc, axis=-1):
    """Forward difference; last row unconditionally f[n-1]-f[n-2], unscaled
    (reference operators.py:14-15)."""
    _check_bc(bc)
    out = (_shifted(f, 1, axis) - f) / h
    out = _set(out, -1, axis, _index(f, -1, axis) - _index(f, -2, axis))
    return out


def grad_backward_weird(f, h, bc, axis=-1):
    """Backward difference; first row unconditionally f[1]-f[0], unscaled
    (reference operators.py:28-29)."""
    _check_bc(bc)
    out = (f - _shifted(f, -1, axis)) / h
    out = _set(out, 0, axis, _index(f, 1, axis) - _index(f, 0, axis))
    return out


# --------------------------------------------------------------------------
# adjoints (needed matrix-free where the reference uses .transpose())
# --------------------------------------------------------------------------

def grad_forward_adjoint(f, h, bc="N", axis=-1):
    """Action of ``grad_forward``'s transpose.

    For bc='N' (zeroed last row): (D^T x)[i] = (x[i-1] - x[i])/h with
    x[-1] := 0 and the "- x[i]" term dropped at i = n-1.
    For bc='D': (D^T x)[i] = (x[i-1] - x[i])/h with x[-1] := 0.
    Used by the GN solver where the reference builds div = -grad^T
    (reference classical.py:103).
    """
    _check_bc(bc)
    if bc == "N":
        # zero the last entry of x before applying the dense-pattern adjoint
        f = _set(f, -1, axis, 0.0)
    return (_shifted(f, -1, axis) - f) / h


def grad_central_adjoint(f, h, bc, axis=-1):
    """Action of ``grad_central``'s transpose (for bc='N' the zeroed
    boundary rows mean the adjoint drops boundary contributions)."""
    _check_bc(bc)
    if bc == "N":
        f = _set(f, 0, axis, 0.0)
        f = _set(f, -1, axis, 0.0)
    return (_shifted(f, -1, axis) - _shifted(f, 1, axis)) / (2.0 * h)
