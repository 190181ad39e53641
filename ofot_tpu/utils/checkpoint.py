"""Checkpoint / resume of FOTO solver state.

The reference has no in-solve checkpointing — its resume granularity is the
per-sequence flag file (reference run.sh:98-117; SURVEY.md §5).  Here the
full ALG2 carry (mu, q, phi, crit, iteration counters) round-trips through a
single .npz so long solves on large grids are restartable, and the sweep
pipeline keeps a sequence-level manifest on top.

Two backends:

  * ``save_state`` / ``load_state`` — single-host .npz (used by the CLI);
  * ``save_state_orbax`` / ``load_state_orbax`` — Orbax PyTree checkpoint
    directories.  Orbax is the production path for sharded state: it
    writes each array with its sharding metadata, so a FotoState produced
    under a ``jax.sharding.Mesh`` checkpoints and restores across hosts
    without gathering to one host first (the .npz path densifies).
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


def save_state_orbax(path: str, state) -> None:
    """Save a ``foto.FotoState`` as an Orbax PyTree checkpoint directory.

    Preserves each array's sharding metadata: a state produced under a
    ``Mesh`` (e.g. the GSPMD/`shard_map` tiled solvers in
    ``ofot_tpu.parallel``) is written distributed and restored with the
    same layout — the multi-host form of SURVEY.md §5's checkpoint/resume
    prescription."""
    import os

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state._asdict(), force=True)


def load_state_orbax(path: str, abstract_state=None):
    """Load a ``foto.FotoState`` saved by :func:`save_state_orbax`.

    ``abstract_state``: optional ``FotoState`` of
    ``jax.ShapeDtypeStruct`` (with shardings) to restore distributed
    arrays directly onto a mesh; None restores addressable arrays."""
    import os

    import orbax.checkpoint as ocp

    from ofot_tpu.solvers.foto import FotoState

    with ocp.PyTreeCheckpointer() as ckptr:
        if abstract_state is not None:
            item = abstract_state._asdict()
            restored = ckptr.restore(
                os.path.abspath(path),
                ocp.args.PyTreeRestore(
                    item=item,
                    restore_args=ocp.checkpoint_utils.construct_restore_args(
                        item)))
        else:
            restored = ckptr.restore(os.path.abspath(path))
    return FotoState(**{k: jnp.asarray(v) if not hasattr(v, "sharding")
                        else v for k, v in restored.items()})
