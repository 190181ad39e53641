"""Checkpoint / resume of FOTO solver state.

The reference has no in-solve checkpointing — its resume granularity is the
per-sequence flag file (reference run.sh:98-117; SURVEY.md §5).  Here the
full ALG2 carry (mu, q, phi, crit, iteration counters) round-trips through a
single .npz so long solves on large grids are restartable, and the sweep
pipeline keeps a sequence-level manifest on top.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_state(path: str, state) -> None:
    """Save a ``foto.FotoState`` to ``path`` (.npz)."""
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        mu=np.asarray(state.mu), q=np.asarray(state.q),
        phi=np.asarray(state.phi),
        crit=np.asarray(state.crit), prev_crit=np.asarray(state.prev_crit),
        iteration=np.asarray(state.iteration),
        cg_iterations=np.asarray(state.cg_iterations),
        done=np.asarray(state.done))


def load_state(path: str):
    """Load a ``foto.FotoState`` saved by :func:`save_state`."""
    from ofot_tpu.solvers.foto import FotoState

    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path)
    return FotoState(
        mu=jnp.asarray(z["mu"]), q=jnp.asarray(z["q"]),
        phi=jnp.asarray(z["phi"]),
        crit=jnp.asarray(z["crit"]), prev_crit=jnp.asarray(z["prev_crit"]),
        iteration=jnp.asarray(z["iteration"]),
        cg_iterations=jnp.asarray(z["cg_iterations"]),
        done=jnp.asarray(z["done"]))
