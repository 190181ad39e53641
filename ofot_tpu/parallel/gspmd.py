"""GSPMD spatial sharding of the solvers (the "write once, annotate, let
XLA insert collectives" path).

The whole solver stack is already pure stencil + pointwise + reduction code,
so partitioning is purely a data-placement decision: place the density
fields with a (y, x)-tiled ``NamedSharding`` and jit the existing solve —
XLA's SPMD partitioner turns the shifted-slice stencils into halo exchanges
(collective-permutes over ICI) and the CG/criterion reductions into
all-reduces.  This is the default multi-chip path; the hand-written
``shard_map`` + ``ppermute`` halo pipeline in ofot_tpu/parallel/halo.py is
the explicitly-scheduled alternative for the hot CG loop.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ofot_tpu.parallel.mesh import field_sharding
from ofot_tpu.solvers import foto, gn


def shard_pair(rho0, rhoT, mesh: Mesh):
    """Place a frame pair on the mesh with (y, x) tiling."""
    sh = field_sharding(mesh)
    return jax.device_put(rho0, sh), jax.device_put(rhoT, sh)


def solve_foto_sharded(rho0, rhoT, Nt: int, mesh: Mesh, **kw) -> foto.FotoState:
    """FOTO ALG2 with the space-time fields tiled over the mesh's (y, x)
    axes.  Shapes must be divisible by the tile counts for best layouts
    (pad-to-bucket upstream if not)."""
    rho0, rhoT = shard_pair(rho0, rhoT, mesh)
    # input shardings propagate: XLA keeps the fields (y, x)-tiled through
    # the solve and replicates the scalar carry entries
    return foto.solve_potential(rho0, rhoT, Nt, **kw)


def solve_gn_sharded(f1, f2, mesh: Mesh, alpha=0.1, lambda_=0.2, **kw):
    """GN solve with (y, x)-tiled fields."""
    f1, f2 = shard_pair(f1, f2, mesh)
    return gn.solve_fields(f1, f2, alpha, lambda_, **kw)


def solve_wfr_sharded(rho0, rhoT, Nt: int, mesh: Mesh, **kw):
    """Unbalanced (WFR) ALG2 with (y, x)-tiled fields — the source channel
    is pointwise, so it shards exactly like the balanced components."""
    from ofot_tpu.solvers import wfr

    rho0, rhoT = shard_pair(rho0, rhoT, mesh)
    return wfr.solve_potential(rho0, rhoT, Nt, **kw)
