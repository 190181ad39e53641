"""Flow extraction: potential -> displacement field via trajectory integration.

TPU-native equivalent of reference ``utils.opticalflow_from_benamoubrenier``
(reference utils.py:148-183) + ``reconstructTrajectory`` (utils.py:44-99):

  * per-time-slice spatial velocities (un, vn) = grad phi_n with the
    central/'N' scheme whose boundary rows are zero (quirk 2), so velocity
    vanishes on the image border; the last time slice stays zero
    (the reference loop runs n in [0, Nt-1));
  * forward-Euler trajectory integration over Nt-1 steps with bilinear
    velocity sampling — vectorized over all Ny*Nx start pixels at once
    (the reference does a pure-Python per-pixel loop, hot loop 3 of
    SURVEY.md §3.1), sequential only in time via ``lax.fori_loop``;
  * luminosity m = -div((u, v)) with the *Dirichlet* central scheme
    (reference benamou_brenier.py:270 builds div with bc='D').

Parity subtleties preserved: the cell index is ``int(x)`` — truncation
toward zero — then clamped to [0, N-2], and the fractional offsets are taken
w.r.t. the *clamped* corner (reference utils.py:64-71), so they may fall
outside [0, 1) near the border; the bilinear weights use them as-is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ofot_tpu.ops import operators


def velocities_from_potential(phi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slice spatial gradient of phi -> (un, vn), each (Nt, Ny, Nx);
    slice Nt-1 is zero (reference utils.py:162-168)."""
    g = operators.grad2d(phi, bc="N")     # batched over the time axis
    un = g[0].at[-1].set(0.0)
    vn = g[1].at[-1].set(0.0)
    return un, vn


def integrate_trajectories(un: jnp.ndarray, vn: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-Euler particle trajectories from every pixel -> displacement
    (u, v), each (Ny, Nx).  Vectorized equivalent of reference
    ``reconstructTrajectory`` (utils.py:44-99) over all pixels."""
    Nt, Ny, Nx = un.shape
    dtype = un.dtype

    x0 = jnp.broadcast_to(jnp.arange(Nx, dtype=dtype)[None, :], (Ny, Nx))
    y0 = jnp.broadcast_to(jnp.arange(Ny, dtype=dtype)[:, None], (Ny, Nx))

    def step(n, carry):
        x, y = carry
        # int() truncates toward zero, then clamp to [0, N-2]
        tx = jnp.clip(jnp.trunc(x).astype(jnp.int32), 0, Nx - 2)
        ty = jnp.clip(jnp.trunc(y).astype(jnp.int32), 0, Ny - 2)
        dx = x - tx.astype(dtype)
        dy = y - ty.astype(dtype)

        w1 = (1.0 - dy) * (1.0 - dx)
        w2 = dx * (1.0 - dy)
        w3 = dy * dx
        w4 = (1.0 - dx) * dy

        u_n = lax.dynamic_index_in_dim(un, n, axis=0, keepdims=False)
        v_n = lax.dynamic_index_in_dim(vn, n, axis=0, keepdims=False)

        def sample(f):
            return (w1 * f[ty, tx] + w2 * f[ty, tx + 1]
                    + w3 * f[ty + 1, tx + 1] + w4 * f[ty + 1, tx])

        return (x + sample(u_n), y + sample(v_n))

    x_end, y_end = lax.fori_loop(0, Nt - 1, step, (x0, y0))
    return x_end - x0, y_end - y0


@jax.jit
def flow_from_potential(phi: jnp.ndarray):
    """phi (Nt, Ny, Nx) -> (u, v, m) displacement + luminosity fields,
    the full reference ``opticalflow_from_benamoubrenier`` contract."""
    un, vn = velocities_from_potential(phi)
    u, v = integrate_trajectories(un, vn)
    m = -operators.div2d(u, v, bc="D")
    return u, v, m
