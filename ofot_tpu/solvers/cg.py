"""Matrix-free (preconditioned) conjugate-gradient solver.

Jitted `lax.while_loop` CG whose convergence semantics match
``scipy.sparse.linalg.cg`` as the reference uses it
(reference benamou_brenier.py:85): start from x0 = 0, stop when
``||r||_2 <= max(rtol * ||b||_2, atol)`` or after ``maxiter`` iterations.

The operator ``A`` is a callable on arrays of any shape (stencil
application), so no matrix is ever materialized.  Dot products go through
``jnp.sum`` which, under GSPMD sharding or inside ``shard_map`` with a
supplied ``reduce`` hook, becomes a `lax.psum`-style cross-device reduction
— this is the distribution point for multi-chip CG (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
from jax import lax


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray   # int32, number of iterations performed
    residual: jnp.ndarray     # final ||r||_2
    converged: jnp.ndarray    # bool


def _default_dot(a, b):
    return jnp.sum(a * b)


def cg(A: Callable, b: jnp.ndarray, *,
       rtol: float = 1e-6, atol: float = 0.0, maxiter: int = 1000,
       M: Optional[Callable] = None,
       dot: Callable = _default_dot,
       x0: Optional[jnp.ndarray] = None) -> CGResult:
    """Solve ``A x = b`` with (preconditioned) CG, matrix-free.

    Parameters mirror scipy's ``cg``; ``M`` is the preconditioner *action*
    (an approximation of A^-1).  Fully traceable: shapes static, loop is a
    ``lax.while_loop``.
    """
    b = jnp.asarray(b)
    # x0 derived from b (not a fresh zeros constant) so the while_loop carry
    # has a consistent varying-axes type under shard_map
    x = b * 0.0 if x0 is None else x0
    precond = M if M is not None else (lambda v: v)

    r = b - A(x) if x0 is not None else b
    z = precond(r)
    p = z
    rz = dot(r, z)
    rnorm2 = rz if M is None else dot(r, r)
    bnorm2 = dot(b, b)
    # scipy: ||r|| <= max(rtol*||b||, atol)
    thresh2 = jnp.maximum(rtol * rtol * bnorm2, atol * atol)

    def cond(state):
        _, _, _, _, rz, rnorm2, k = state
        return (k < maxiter) & (rnorm2 > thresh2)

    def body(state):
        x, r, p, z, rz, rnorm2, k = state
        q = A(p)
        pq = dot(p, q)
        alpha = rz / pq
        x = x + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = dot(r, z)
        rnorm2_new = rz_new if M is None else dot(r, r)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, z, rz_new, rnorm2_new, k + 1)

    x, r, p, z, rz, rnorm2, k = lax.while_loop(
        cond, body, (x, r, p, z, rz, rnorm2, jnp.int32(0)))

    return CGResult(x=x, iterations=k, residual=jnp.sqrt(rnorm2),
                    converged=rnorm2 <= thresh2)
