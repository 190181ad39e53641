"""WFR (unbalanced) ALG2 under shard_map: spatially tiled.

Same machinery as ofot_tpu/parallel/foto_sharded.py, running
``ofot_tpu.solvers.wfr.alg2_loop`` inside ``shard_map`` over a (y, x)
mesh: the 4-component (rho, m1, m2, sigma) fields are tiled like the
balanced 3-component ones (the source channel is pointwise, so it adds
no halo traffic), stencil halos move by ``lax.ppermute`` and the CG /
criterion reductions by ``lax.psum`` via the injected
``parallel.halo.ShardedOps``.

Correctness contract (tests/test_parallel.py): tiled == whole-grid WFR
solve to fp tolerance on the virtual CPU mesh.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ofot_tpu.parallel.halo import ShardedOps
from ofot_tpu.parallel.foto_sharded import _state_specs
from ofot_tpu.solvers import wfr


def solve_potential_tiled(rho0, rhoT, Nt: int, mesh: Mesh, *,
                          delta=10.0, r=1.0, convergence_tol=0.3,
                          reg_epsilon=1e-3, max_it=100, cg_rtol=1e-6,
                          cg_maxiter=1000, admm_alpha=1.0, auto_r=False):
    """Unbalanced ALG2 with (y, x) spatial tiling via shard_map.

    ``rho0``/``rhoT`` are full (Ny, Nx) frames; Ny, Nx must divide by the
    mesh's y/x sizes, with local tiles >= 2 along sharded axes.
    """
    py, px = mesh.shape["y"], mesh.shape["x"]
    Ny, Nx = rho0.shape
    if Ny % py or Nx % px:
        raise ValueError(f"grid {(Ny, Nx)} not divisible by mesh {(py, px)}")
    if Ny // py < 2 or Nx // px < 2:
        raise ValueError("local tiles must be >= 2 pixels per sharded axis")

    fn = _tiled_fn(mesh, Nt, delta, r, convergence_tol, reg_epsilon,
                   max_it, cg_rtol, cg_maxiter, admm_alpha, auto_r)
    return fn(rho0, rhoT)


@lru_cache(maxsize=64)
def _tiled_fn(mesh, Nt, delta, r, convergence_tol, reg_epsilon, max_it,
              cg_rtol, cg_maxiter, admm_alpha, auto_r=False):
    """Jitted shard_map wrapper, cached per (mesh, params) — jax.jit keys
    on callable identity (see foto_sharded._tiled_fn)."""
    py, px = mesh.shape["y"], mesh.shape["x"]
    sops = ShardedOps(ax_y="y", ax_x="x", size_y=py, size_x=px)
    fn = shard_map(
        partial(wfr.alg2_loop, Nt=Nt, delta=delta, r=r,
                convergence_tol=convergence_tol, reg_epsilon=reg_epsilon,
                max_it=max_it, cg_rtol=cg_rtol, cg_maxiter=cg_maxiter,
                ops=sops, admm_alpha=admm_alpha, auto_r=auto_r),
        mesh=mesh,
        in_specs=(P("y", "x"), P("y", "x")),
        out_specs=_state_specs(P(None, None, "y", "x"), P(None, "y", "x")),
    )
    return jax.jit(fn)
