"""Coarse-to-fine (pyramid) estimation for large displacements.

Framework extension (no reference equivalent): the GN/HS solvers linearize
the brightness constraint around zero flow, so they only capture
sub-pixel-ish motion; the standard fix is a resolution pyramid — solve at a
coarse scale where the motion is small, upsample the flow, warp frame 1
toward frame 2, and solve for the residual at the next scale.

Everything stays on-device: `jax.image.resize` for the pyramid and flow
upsampling, the framework's own backward warp for the warping step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ofot_tpu.utils.warp import apply_flow


def _resize(f: jnp.ndarray, shape) -> jnp.ndarray:
    return jax.image.resize(f, shape, method="linear")


def _pyramid_shapes(shape, levels: int, scale: float, min_size: int):
    shapes = [tuple(shape)]
    for _ in range(levels - 1):
        ny, nx = shapes[-1]
        ny2, nx2 = int(round(ny * scale)), int(round(nx * scale))
        if min(ny2, nx2) < min_size:
            break
        shapes.append((ny2, nx2))
    return shapes                      # finest first


def solve_coarse_to_fine(f1, f2, solve_level: Callable, levels: int = 3,
                         scale: float = 0.5, min_size: int = 16):
    """Pyramid driver.

    ``solve_level(f1_warped, f2) -> (du, dv)`` is the per-level incremental
    solver (e.g. a lambda around ``hs.solve_fields`` or ``gn.solve_fields``).
    Returns the accumulated (u, v) at full resolution.
    """
    f1 = jnp.asarray(f1)
    f2 = jnp.asarray(f2)
    shapes = _pyramid_shapes(f1.shape, levels, scale, min_size)

    u = jnp.zeros(shapes[-1], f1.dtype)
    v = jnp.zeros(shapes[-1], f1.dtype)

    for lvl in range(len(shapes) - 1, -1, -1):     # coarsest -> finest
        shp = shapes[lvl]
        f1_l = _resize(f1, shp)
        f2_l = _resize(f2, shp)
        if u.shape != shp:
            # upsample the flow and rescale its magnitude per axis
            u = _resize(u, shp) * (shp[1] / u.shape[1])
            v = _resize(v, shp) * (shp[0] / v.shape[0])
        f1_w = apply_flow(f1_l, u, v, None)
        du, dv = solve_level(f1_w, f2_l)
        u = u + du
        v = v + dv
    return u, v


def solve_hs_pyramid(f1, f2, alpha=0.1, levels: int = 4, scale: float = 0.5,
                     **hs_kw):
    """Pyramidal Horn–Schunck."""
    from ofot_tpu.solvers import hs

    def level(a, b):
        r = hs.solve_fields(a, b, alpha, **hs_kw)
        return r.u, r.v

    return solve_coarse_to_fine(f1, f2, level, levels=levels, scale=scale)


def solve_gn_pyramid(f1, f2, alpha=0.1, lambda_=0.2, levels: int = 4,
                     scale: float = 0.5, **gn_kw):
    """Pyramidal GN: (u, v) coarse-to-fine, luminosity m solved at the
    finest level around the final warp."""
    from ofot_tpu.solvers import gn

    def level(a, b):
        r = gn.solve_fields(a, b, alpha, lambda_, **gn_kw)
        return r.u, r.v

    u, v = solve_coarse_to_fine(f1, f2, level, levels=levels, scale=scale)
    f1_w = apply_flow(jnp.asarray(f1), u, v, None)
    m = gn.solve_fields(f1_w, jnp.asarray(f2), alpha, lambda_, **gn_kw).m
    return u, v, m


# jitted entry points for the CLI: the level loop is Python (static
# shapes), so one jit compiles the whole coarse-to-fine chain into a
# single program — eager per-level dispatch through the remote TPU
# tunnel would cost seconds per op (CLAUDE.md).  Module-level so jax.jit
# caches across the pipeline's repeated in-process CLI invocations.
@partial(jax.jit, static_argnames=("levels",))
def solve_gn_pyramid_jit(f1, f2, alpha=0.1, lambda_=0.2, *, levels=4):
    return solve_gn_pyramid(f1, f2, alpha, lambda_, levels=levels)


@partial(jax.jit, static_argnames=("levels",))
def solve_hs_pyramid_jit(f1, f2, alpha=0.1, *, levels=4):
    return solve_hs_pyramid(f1, f2, alpha, levels=levels)
