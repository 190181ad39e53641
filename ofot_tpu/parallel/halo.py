"""Explicit halo-exchange stencils for shard_map execution.

The hand-scheduled alternative to GSPMD auto-partitioning: inside
``shard_map`` each program owns a (Nt, Ny_loc, Nx_loc) tile and the 1-pixel
stencil halos travel over ICI via ``lax.ppermute`` (SURVEY.md §5
"long-context analogue": tile-partitioned grid, neighbor exchange).

Boundary-condition quirks are *global*: a tile's edge rows get the special
'N'/'weird' treatment only when the tile actually sits on the global grid
boundary — detected with ``lax.axis_index`` and applied with masked updates.
Tiles that are interior receive their neighbor's edge (ppermute delivers
zeros to tiles with no source, which coincides with zero-ghost 'D'
truncation at the global edges).

Requires local tile extents >= 2 along sharded axes (the boundary formulas
touch the first two / last two lines, which are then tile-local).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
from jax import lax

from ofot_tpu.ops import stencils
from ofot_tpu.ops.stencils import _index, _set   # shared static helpers


def _halo_shift(f, offset: int, axis: int, ax_name: str, ax_size: int):
    """out[i] = f_global[i + offset] on the local tile (|offset| = 1)."""
    n = f.shape[axis]
    if ax_size == 1:
        return stencils._shifted(f, offset, axis)
    if offset == 1:
        edge = lax.slice_in_dim(f, 0, 1, axis=axis)          # my first line
        recv = lax.ppermute(edge, ax_name,
                            [(i, i - 1) for i in range(1, ax_size)])
        body = lax.slice_in_dim(f, 1, n, axis=axis)
        return jnp.concatenate([body, recv], axis=axis)
    if offset == -1:
        edge = lax.slice_in_dim(f, n - 1, n, axis=axis)      # my last line
        recv = lax.ppermute(edge, ax_name,
                            [(i, i + 1) for i in range(ax_size - 1)])
        body = lax.slice_in_dim(f, 0, n - 1, axis=axis)
        return jnp.concatenate([recv, body], axis=axis)
    raise ValueError(f"halo shift only supports |offset| == 1, got {offset}")


def _masked_boundary_set(out, axis, ax_name, ax_size, lo_val, hi_val):
    """Overwrite the global-first/global-last line of ``out`` along ``axis``
    with lo_val/hi_val, only on the tiles owning those global lines."""
    if ax_size == 1:
        out = _set(out, 0, axis, lo_val)
        out = _set(out, -1, axis, hi_val)
        return out
    idx = lax.axis_index(ax_name)
    is_lo = idx == 0
    is_hi = idx == ax_size - 1
    out = _set(out, 0, axis, jnp.where(is_lo, lo_val, _index(out, 0, axis)))
    out = _set(out, -1, axis, jnp.where(is_hi, hi_val, _index(out, -1, axis)))
    return out


def lap1d_halo(f, h, bc, axis, ax_name, ax_size):
    """Distributed ``stencils.lap1d`` (3-point Laplacian with 'N'/'D' rows
    at the *global* boundary)."""
    h2 = h * h
    out = (_halo_shift(f, 1, axis, ax_name, ax_size) - 2.0 * f
           + _halo_shift(f, -1, axis, ax_name, ax_size)) / h2
    if bc == "N":
        lo = (-_index(f, 0, axis) + _index(f, 1, axis)) / h2
        hi = (-_index(f, -1, axis) + _index(f, -2, axis)) / h2
        out = _masked_boundary_set(out, axis, ax_name, ax_size, lo, hi)
    return out


def grad_central_weird_halo(f, h, bc, axis, ax_name, ax_size):
    """Distributed ``stencils.grad_central_weird`` (unscaled one-sided
    global-boundary rows for 'N')."""
    out = (_halo_shift(f, 1, axis, ax_name, ax_size)
           - _halo_shift(f, -1, axis, ax_name, ax_size)) / (2.0 * h)
    if bc == "N":
        lo = _index(f, 1, axis) - _index(f, 0, axis)
        hi = _index(f, -1, axis) - _index(f, -2, axis)
        out = _masked_boundary_set(out, axis, ax_name, ax_size, lo, hi)
    return out


def grad_central_halo(f, h, bc, axis, ax_name, ax_size):
    """Distributed ``stencils.grad_central`` (zeroed global-boundary rows
    for 'N')."""
    out = (_halo_shift(f, 1, axis, ax_name, ax_size)
           - _halo_shift(f, -1, axis, ax_name, ax_size)) / (2.0 * h)
    if bc == "N":
        zero = jnp.zeros_like(_index(f, 0, axis))
        out = _masked_boundary_set(out, axis, ax_name, ax_size, zero, zero)
    return out


def grad_forward_halo(f, h, bc, axis, ax_name, ax_size):
    """Distributed ``stencils.grad_forward`` ('N': global-last row zero)."""
    out = (_halo_shift(f, 1, axis, ax_name, ax_size) - f) / h
    if bc == "N":
        zero = jnp.zeros_like(_index(f, -1, axis))
        if ax_size == 1:
            return _set(out, -1, axis, zero)
        is_hi = lax.axis_index(ax_name) == ax_size - 1
        return _set(out, -1, axis,
                    jnp.where(is_hi, zero, _index(out, -1, axis)))
    return out


def grad_forward_adjoint_halo(f, h, bc, axis, ax_name, ax_size):
    """Distributed ``stencils.grad_forward_adjoint``."""
    if bc == "N":
        zero = jnp.zeros_like(_index(f, -1, axis))
        if ax_size == 1:
            f = _set(f, -1, axis, zero)
        else:
            is_hi = lax.axis_index(ax_name) == ax_size - 1
            f = _set(f, -1, axis,
                     jnp.where(is_hi, zero, _index(f, -1, axis)))
    return (_halo_shift(f, -1, axis, ax_name, ax_size) - f) / h


# ------------------------------------------------------------------ context

@dataclass(frozen=True)
class ShardedOps:
    """Space-time operator set bound to a (y, x) shard_map context.

    Drop-in replacement for the functions in ``ofot_tpu.ops.operators`` plus
    a ``psum``-backed global ``sum`` — hand this to the FOTO solver to run
    the whole ALG2 loop inside shard_map (see
    ofot_tpu/parallel/foto_sharded.py).
    """
    ax_y: str
    ax_x: str
    size_y: int
    size_x: int

    @property
    def axes(self):
        """All mesh axis names — psum must run over size-1 axes too so the
        result is typed invariant (vma) under shard_map."""
        return (self.ax_y, self.ax_x)

    def grad_st(self, phi, dt=1.0, dx=1.0, dy=1.0, bc="N"):
        gt = stencils.grad_central_weird(phi, dt, bc, axis=-3)
        gx = grad_central_weird_halo(phi, dx, bc, -1, self.ax_x, self.size_x)
        gy = grad_central_weird_halo(phi, dy, bc, -2, self.ax_y, self.size_y)
        return jnp.stack([gt, gx, gy])

    def div_st(self, mu, dt=1.0, dx=1.0, dy=1.0, bc="N"):
        return (stencils.grad_central_weird(mu[0], dt, bc, axis=-3)
                + grad_central_weird_halo(mu[1], dx, bc, -1,
                                          self.ax_x, self.size_x)
                + grad_central_weird_halo(mu[2], dy, bc, -2,
                                          self.ax_y, self.size_y))

    def laplacian_st(self, phi, dt=1.0, dx=1.0, dy=1.0, bc="N"):
        return (stencils.lap1d(phi, dt, bc, axis=-3)
                + lap1d_halo(phi, dx, bc, -1, self.ax_x, self.size_x)
                + lap1d_halo(phi, dy, bc, -2, self.ax_y, self.size_y))

    def sum(self, x):
        local = jnp.sum(x)
        axes = self.axes
        return lax.psum(local, axes) if axes else local

    def max(self, x):
        """Global max over the full field — ``jnp.max`` alone would be
        tile-local inside shard_map, which silently gives each device a
        different ``auto_r`` penalty (review, round 4)."""
        local = jnp.max(x)
        axes = self.axes
        return lax.pmax(local, axes) if axes else local

    @staticmethod
    def project(p):
        from ofot_tpu.ops.projection import project_paraboloid
        return project_paraboloid(p)     # pointwise, tile-local

    @staticmethod
    def project_nd(p):
        from ofot_tpu.ops.projection import project_paraboloid_nd
        return project_paraboloid_nd(p)  # pointwise, tile-local (WFR)

    def cg_operator(self, r, reg_epsilon):
        return lambda phi: (-r * self.laplacian_st(phi, bc="N")
                            + (r * reg_epsilon) * phi)

    def stepA_solve(self, F, r, reg_epsilon, cg_rtol, cg_maxiter):
        """Distributed CG: halo stencils in the operator, psum dots."""
        from ofot_tpu.solvers.cg import cg
        res = cg(self.cg_operator(r, reg_epsilon), F, rtol=cg_rtol,
                 maxiter=cg_maxiter, dot=lambda a, b: self.sum(a * b))
        return res.x, res.iterations
