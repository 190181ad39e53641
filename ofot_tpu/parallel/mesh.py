"""Device-mesh construction helpers.

The reference is strictly single-process (SURVEY.md §2 "parallelism
inventory: none"); all distribution here is net-new and built on
``jax.sharding.Mesh`` + GSPMD / ``shard_map`` with XLA collectives — the
TPU-native replacement for what a CUDA codebase would do with NCCL/MPI.

Axis conventions used across the framework:
  * ``data``  — batch of independent sequences (pure DP, the run.sh
    per-sequence loop done right);
  * ``y, x``  — spatial tile decomposition of the image grid (the stencil
    world's analogue of tensor/context parallelism; halos ride ICI).
"""

from __future__ import annotations

import math

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh from an {axis: size} spec, e.g. {"data": 2, "y": 2,
    "x": 2}.  With no spec: all devices on a 1-D ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": len(devices)}
    sizes = list(shape.values())
    n = math.prod(sizes)
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


def spatial_mesh(ny_tiles: int, nx_tiles: int, devices=None) -> Mesh:
    """(y, x) tile mesh for one big grid split across devices."""
    return make_mesh({"y": ny_tiles, "x": nx_tiles}, devices)


def batch_spatial_mesh(n_data: int, ny_tiles: int, nx_tiles: int,
                       devices=None) -> Mesh:
    """(data, y, x) mesh: sequences sharded over ``data``, each grid tiled
    over (y, x)."""
    return make_mesh({"data": n_data, "y": ny_tiles, "x": nx_tiles}, devices)


def field_sharding(mesh: Mesh, *, batch: bool = False,
                   leading_dims: int = 0) -> NamedSharding:
    """NamedSharding for a field array whose trailing two dims are (Ny, Nx).

    ``leading_dims`` counts unsharded leading axes (component axis, time
    axis); ``batch=True`` prepends a ``data``-sharded batch axis."""
    spec = []
    if batch:
        spec.append("data")
    spec += [None] * leading_dims
    spec += ["y" if "y" in mesh.axis_names else None,
             "x" if "x" in mesh.axis_names else None]
    return NamedSharding(mesh, P(*spec))
