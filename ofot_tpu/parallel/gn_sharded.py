"""GN variational solve under shard_map: spatially tiled, explicit halos.

The GN block operator tiles cleanly: the smoothness Laplacian
``-grad_forward^T grad_forward`` becomes halo stencils
(ofot_tpu/parallel/halo.py), the rank-1 data term and the Sherman–Morrison
block-Jacobi preconditioner are pointwise (tile-local), and the CG dot
products reduce with ``lax.psum``.  The spectral (DCT) preconditioner is a
*global* transform, so the tiled path uses the Jacobi preconditioner; for
global spectral preconditioning on a mesh use the GSPMD path
(``ofot_tpu.parallel.gspmd.solve_gn_sharded``), where XLA shards the DCT
matmuls itself.

Tile-vs-whole equivalence is asserted in tests/test_parallel.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ofot_tpu.parallel import halo
from ofot_tpu.solvers import gn
from ofot_tpu.solvers.cg import cg, CGResult


def _lap_gn_halo(u, sops: halo.ShardedOps):
    gx = halo.grad_forward_halo(u, 1.0, "N", -1, sops.ax_x, sops.size_x)
    gy = halo.grad_forward_halo(u, 1.0, "N", -2, sops.ax_y, sops.size_y)
    return -(halo.grad_forward_adjoint_halo(gx, 1.0, "N", -1,
                                            sops.ax_x, sops.size_x)
             + halo.grad_forward_adjoint_halo(gy, 1.0, "N", -2,
                                              sops.ax_y, sops.size_y))


def _lap_diag_tile(shape, sops: halo.ShardedOps, dtype):
    """Per-tile diagonal of -lap_gn: 2 per axis interior, 1 on the lines
    that are *globally* first/last along that axis."""
    ny, nx = shape

    def axis_diag(n, ax_name, ax_size):
        d = jnp.full((n,), 2.0, dtype)
        if ax_size == 1:
            return d.at[0].set(1.0).at[-1].set(1.0)
        idx = lax.axis_index(ax_name)
        d = d.at[0].set(jnp.where(idx == 0, 1.0, 2.0))
        d = d.at[-1].set(jnp.where(idx == ax_size - 1, 1.0, 2.0))
        return d

    dx = axis_diag(nx, sops.ax_x, sops.size_x)
    dy = axis_diag(ny, sops.ax_y, sops.size_y)
    return dx[None, :] + dy[:, None]


def _gn_tile_solve(f1, f2, alpha, lambda_, rtol, maxiter,
                   sops: halo.ShardedOps):
    """Runs inside shard_map on local (ny, nx) tiles."""
    fx = halo.grad_central_halo(f2, 1.0, "N", -1, sops.ax_x, sops.size_x)
    fy = halo.grad_central_halo(f2, 1.0, "N", -2, sops.ax_y, sops.size_y)
    ft = f2 - f1
    g = jnp.stack([fx, fy, -f2])

    def A(x):
        smooth = jnp.stack([
            -alpha * _lap_gn_halo(x[0], sops),
            -alpha * _lap_gn_halo(x[1], sops),
            -lambda_ * _lap_gn_halo(x[2], sops),
        ])
        return smooth + g * (g[0] * x[0] + g[1] * x[1] + g[2] * x[2])[None]

    ld = _lap_diag_tile(f2.shape, sops, f2.dtype)
    d = jnp.stack([alpha * ld, alpha * ld, lambda_ * ld])
    # pointwise, so the shared helper works unchanged on shard_map tiles
    # (review, round 4 — was an inline duplicate)
    M = gn.make_jacobi_block_preconditioner(g, d)

    b = jnp.stack([-fx * ft, -fy * ft, f2 * ft])
    res = cg(A, b, rtol=rtol, maxiter=maxiter, M=M,
             dot=lambda p, q: sops.sum(p * q))
    return gn.GNResult(u=res.x[0], v=res.x[1], m=res.x[2], cg=res)


def solve_fields_tiled(f1, f2, mesh: Mesh, alpha=0.1, lambda_=0.2,
                       rtol=1e-10, maxiter=5000) -> gn.GNResult:
    """GN solve with the grid tiled over the mesh's (y, x) axes."""
    py, px = mesh.shape["y"], mesh.shape["x"]
    Ny, Nx = f1.shape
    if Ny % py or Nx % px:
        raise ValueError(f"grid {(Ny, Nx)} not divisible by mesh {(py, px)}")
    if Ny // py < 2 or Nx // px < 2:
        raise ValueError("local tiles must be >= 2 pixels per sharded axis")

    fn = _tiled_gn_fn(mesh, alpha, lambda_, rtol, maxiter)
    return fn(jnp.asarray(f1), jnp.asarray(f2))


@lru_cache(maxsize=64)
def _tiled_gn_fn(mesh, alpha, lambda_, rtol, maxiter):
    """Jitted shard_map wrapper, cached per (mesh, params) — rebuilding it
    per call would recompile the CG loop on every invocation."""
    py, px = mesh.shape["y"], mesh.shape["x"]
    sops = halo.ShardedOps(ax_y="y", ax_x="x", size_y=py, size_x=px)
    fn = shard_map(
        partial(_gn_tile_solve, alpha=alpha, lambda_=lambda_, rtol=rtol,
                maxiter=maxiter, sops=sops),
        mesh=mesh,
        in_specs=(P("y", "x"), P("y", "x")),
        out_specs=gn.GNResult(
            u=P("y", "x"), v=P("y", "x"), m=P("y", "x"),
            cg=CGResult(x=P(None, "y", "x"), iterations=P(),
                        residual=P(), converged=P())),
    )
    return jax.jit(fn)
