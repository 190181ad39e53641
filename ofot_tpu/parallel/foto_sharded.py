"""FOTO ALG2 under shard_map: spatially tiled, explicitly scheduled.

Runs the *identical* ALG2 loop from ofot_tpu.solvers.foto inside
``shard_map`` over a (y, x) device mesh: each device owns an
(Nt, Ny/py, Nx/px) tile of every field, stencil halos move by
``lax.ppermute`` (ofot_tpu/parallel/halo.py) and the CG dot products /
convergence criterion reduce with ``lax.psum`` — the stencil-code analogue
of tensor/context parallelism (SURVEY.md §5).

Correctness contract (tested in tests/test_parallel.py): the tiled solve
equals the single-device solve to fp tolerance on a virtual CPU mesh —
this equivalence test is the framework's race detector for halo/reduction
bugs (SURVEY.md §5 "race detection").
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ofot_tpu.parallel.halo import ShardedOps
from ofot_tpu.solvers import foto


def _state_specs(spec_field3, spec_field1):
    return foto.FotoState(
        mu=spec_field3, q=spec_field3, phi=spec_field1,
        crit=P(), prev_crit=P(), iteration=P(), cg_iterations=P(),
        done=P())


def solve_potential_tiled(rho0, rhoT, Nt: int, mesh: Mesh, *,
                          r=1.0, convergence_tol=0.3, reg_epsilon=1e-3,
                          max_it=100, cg_rtol=1e-6, cg_maxiter=1000,
                          admm_alpha=1.0,
                          auto_r=False) -> foto.FotoState:
    """ALG2 with (y, x) spatial tiling via shard_map + ppermute halos.

    ``rho0``/``rhoT`` are full (Ny, Nx) frames; Ny, Nx must divide by the
    mesh's y/x sizes, with local tiles >= 2 along sharded axes.
    """
    py, px = mesh.shape["y"], mesh.shape["x"]
    Ny, Nx = rho0.shape
    if Ny % py or Nx % px:
        raise ValueError(f"grid {(Ny, Nx)} not divisible by mesh {(py, px)}")
    if Ny // py < 2 or Nx // px < 2:
        raise ValueError("local tiles must be >= 2 pixels per sharded axis")

    fn = _tiled_fn(mesh, Nt, r, convergence_tol, reg_epsilon, max_it,
                   cg_rtol, cg_maxiter, admm_alpha, auto_r)
    return fn(rho0, rhoT)


@lru_cache(maxsize=64)
def _tiled_fn(mesh, Nt, r, convergence_tol, reg_epsilon, max_it,
              cg_rtol, cg_maxiter, admm_alpha=1.0, auto_r=False):
    """Jitted shard_map wrapper, cached per (mesh, params): jax.jit keys on
    callable identity, so rebuilding the wrapper per call would recompile
    the full ALG2 while_loop on every invocation (remote TPU compiles run
    seconds to minutes here)."""
    py, px = mesh.shape["y"], mesh.shape["x"]
    sops = ShardedOps(ax_y="y", ax_x="x", size_y=py, size_x=px)
    fn = shard_map(
        partial(foto.alg2_loop, Nt=Nt, r=r,
                convergence_tol=convergence_tol, reg_epsilon=reg_epsilon,
                max_it=max_it, cg_rtol=cg_rtol, cg_maxiter=cg_maxiter,
                ops=sops, admm_alpha=admm_alpha, auto_r=auto_r),
        mesh=mesh,
        in_specs=(P("y", "x"), P("y", "x")),
        out_specs=_state_specs(P(None, None, "y", "x"), P(None, "y", "x")),
    )
    return jax.jit(fn)
