"""Backward warping of an image by a flow field.

Vectorized, jittable equivalent of the reference's per-pixel Python loop
``apply_opticalflow`` (reference utils.py:186-248, hot loop 4 of SURVEY.md
§3.1), preserving its exact numerics:

  * optional luminosity pre-multiplication ``f1 <- (1 + m) * f1``
    (reference utils.py:202-203);
  * source position (i - v, j - u); fractional offsets via ``int()``
    truncation toward zero computed **before** clamping the position into
    the image (so offsets can be negative near the border);
  * positions clamped into [0, h-1] x [0, w-1]; the four reference boundary
    branches (utils.py:228-247) collapse to clamping the +1 neighbor index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def apply_flow(f1: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               m: jnp.ndarray | None = None) -> jnp.ndarray:
    """Backward-warp ``f1`` (Ny, Nx) by flow (u, v); optional luminosity m.

    Returns the warped image (Ny, Nx).  Matches reference
    ``apply_opticalflow`` pointwise.
    """
    f1 = jnp.asarray(f1)
    h, w = f1.shape
    dtype = f1.dtype
    if m is not None:
        f1 = (1.0 + m) * f1

    jj = jnp.broadcast_to(jnp.arange(w, dtype=dtype)[None, :], (h, w))
    ii = jnp.broadcast_to(jnp.arange(h, dtype=dtype)[:, None], (h, w))

    src_i = ii - v
    src_j = jj - u

    # fractional offsets w.r.t. the truncated (toward zero), UNclamped corner
    di = src_i - jnp.trunc(src_i)
    dj = src_j - jnp.trunc(src_j)

    w1 = (1.0 - di) * (1.0 - dj)
    w2 = dj * (1.0 - di)
    w3 = di * dj
    w4 = (1.0 - dj) * di

    ti = jnp.trunc(jnp.clip(src_i, 0.0, h - 1)).astype(jnp.int32)
    tj = jnp.trunc(jnp.clip(src_j, 0.0, w - 1)).astype(jnp.int32)
    tip = jnp.minimum(ti + 1, h - 1)
    tjp = jnp.minimum(tj + 1, w - 1)

    return (w1 * f1[ti, tj] + w2 * f1[ti, tjp]
            + w3 * f1[tip, tjp] + w4 * f1[tip, tj])
