"""Multi-host execution scaffolding.

Two ways to scale the sweep beyond one host (SURVEY.md §5 "distributed
communication backend"):

1. **SPMD multi-host** — ``initialize()`` wraps
   ``jax.distributed.initialize``; afterwards ``jax.devices()`` spans the
   pod and the meshes from ``ofot_tpu.parallel.mesh`` shard over all chips
   (DCN between hosts is handled by XLA's collectives; lay out meshes so
   halo neighbors stay on-host/ICI — ``make_mesh`` orders axes
   data-outermost for exactly this reason).

2. **Embarrassing host partitioning** — independent Middlebury sequences
   need no communication at all, so ``partition_keys`` deterministically
   splits the sequence list across hosts; each host runs its share of the
   sweep with local flag-file resume, and the per-sequence manifest shards
   merge trivially (``merge_manifests``).  This is the reference's
   run.sh-loop parallelism done properly.
"""

from __future__ import annotations

import json
from pathlib import Path


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Initialize JAX multi-host; returns (process_index, process_count).

    No-ops gracefully on a single host with no coordinator configured.
    """
    import jax

    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def partition_keys(keys, process_id: int, process_count: int):
    """Deterministic round-robin split of sequence keys across hosts."""
    keys = sorted(keys)
    return [k for i, k in enumerate(keys) if i % process_count == process_id]


def merge_manifests(paths, out_path: str) -> dict:
    """Merge per-host manifest shards into one manifest.json."""
    merged: dict = {}
    for p in paths:
        p = Path(p)
        if p.exists():
            merged.update(json.loads(p.read_text()))
    Path(out_path).write_text(json.dumps(merged, indent=1))
    return merged
