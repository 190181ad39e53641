"""Operator smoke tool — equivalent of the reference's test.py (C17).

Materializes the matrix-free stencils as dense matrices (by applying them
to identity columns) and prints them exactly as the reference's manual
harness does (reference test.py:5-15), including the
``sum(-grad_st('N')^T - div_st('D'))`` adjointness probe.

Usage: python -m ofot_tpu.cli.print_operators
"""

from __future__ import annotations

import sys

import numpy as np


def densify(apply_fn, in_shape, out_shape=None):
    """Dense matrix of a linear stencil by acting on identity columns."""
    import jax
    import jax.numpy as jnp

    n_in = int(np.prod(in_shape))
    eye = jnp.eye(n_in).reshape((n_in,) + tuple(in_shape))
    cols = jax.vmap(apply_fn)(eye)
    return np.asarray(cols.reshape(n_in, -1)).T


def main(argv=None) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from ofot_tpu.ops import stencils, operators

    print(densify(lambda x: stencils.grad_forward(x, 1, "N"), (5,)))
    print(densify(lambda x: stencils.grad_backward(x, 1, "D"), (5,)))
    print(-densify(lambda x: stencils.grad_forward(x, 1, "N"), (5,)).T)

    grad = densify(lambda x: operators.grad_st(x, bc="N"), (3, 3, 3))
    div = densify(lambda m: operators.div_st(m, bc="D"), (3, 3, 3, 3))
    print(grad)
    print(div)

    print(np.sum(-grad.T - div))
    return 0


if __name__ == "__main__":
    sys.exit(main())
