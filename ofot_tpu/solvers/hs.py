"""Horn–Schunck optical flow (GN without the luminosity unknown).

Framework extension (no reference equivalent, though the reference's CLI
labels its parameters "Horn-Schunck alpha/lambda" — reference main.py:44-45):
the classic 2-unknown variational problem

    min  (fx u + fy v + ft)^2 + alpha (|grad u|^2 + |grad v|^2)

discretized identically to the GN solver (same fx/fy/ft, same
``-grad_forward^T grad_forward`` Laplacian), solved matrix-free with the
same spectral/Jacobi preconditioned CG.  Setting the GN system's third row
and column to zero recovers exactly this system, so all GN parity
machinery applies.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ofot_tpu.ops import operators
from ofot_tpu.solvers.cg import cg, CGResult
from ofot_tpu.solvers.gn import (image_gradients, _lap_diag,
                                 make_jacobi_block_preconditioner,
                                 make_spectral_block_preconditioner)


class HSResult(NamedTuple):
    u: jnp.ndarray
    v: jnp.ndarray
    cg: CGResult


@partial(jax.jit, static_argnames=("maxiter", "precond"))
def solve_fields(f1, f2, alpha=0.1, rtol=1e-10, maxiter=5000,
                 precond="spectral"):
    """Solve Horn–Schunck; returns (u, v) fields + CG diagnostics."""
    f1 = jnp.asarray(f1)
    f2 = jnp.asarray(f2)
    fx, fy = image_gradients(f2)
    ft = f2 - f1
    g = jnp.stack([fx, fy])

    def A(x):
        smooth = jnp.stack([-alpha * operators.lap_gn(x[0]),
                            -alpha * operators.lap_gn(x[1])])
        return smooth + g * (g[0] * x[0] + g[1] * x[1])[None]

    Ny, Nx = f2.shape
    if precond == "spectral":
        M = make_spectral_block_preconditioner(g, (alpha, alpha))
    else:
        ld = _lap_diag(Ny, Nx, f2.dtype)
        M = make_jacobi_block_preconditioner(
            g, jnp.stack([alpha * ld, alpha * ld]))

    b = jnp.stack([-fx * ft, -fy * ft])
    res = cg(A, b, rtol=rtol, maxiter=maxiter, M=M)
    return HSResult(u=res.x[0], v=res.x[1], cg=res)
