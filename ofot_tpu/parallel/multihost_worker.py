"""Executable multi-host worker: the *real* ``jax.distributed.initialize``
path, one process per host.

Through round 4 the distributed backend's core line
(:func:`ofot_tpu.parallel.multihost.initialize`) had only ever run as the
single-process no-op; everything multi-chip was validated on one process
with a virtual device mesh.  This module is the process that actually joins
a coordinator (VERDICT.md r4 item 1).  It is both the production entry
point for a multi-host sweep and the subject of the two-process
localhost test (tests/test_multihost.py::test_real_two_process_distributed):

    python -m ofot_tpu.parallel.multihost_worker \
        --coordinator localhost:12355 --process-id 0 --num-processes 2 \
        --local-devices 4 --out /tmp/host0.json \
        [--data-root data --results results]

Each worker:

1. joins the coordinator via ``multihost.initialize`` (CPU processes use
   jaxlib's built-in Gloo collectives — the default
   ``jax_cpu_collectives_implementation``; TPU pods use ICI/DCN),
2. runs a cross-process ``psum`` over the *global* device set (shard_map
   over a 1-D mesh spanning every process's devices),
3. runs a small GSPMD-sharded FOTO solve over the global mesh
   (``gspmd.solve_foto_sharded`` — XLA partitions the stencils into
   halo exchanges that cross the process boundary),
4. optionally runs its partition of the benchmark sweep
   (``pipeline run --host-id <process_index>``), writing the per-host
   manifest shard that ``pipeline merge-manifests`` later folds,
5. writes a JSON record of everything it measured to ``--out``.

The reference has no multi-host story at all (its run.sh is a sequential
per-sequence loop, reference run.sh:86-119); this is the TPU-native
replacement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


def _smooth_pair(ny: int, nx: int, shift=(2.0, 1.0)):
    """Deterministic smooth density pair (every process must build the
    identical input, since the global array is assembled per-shard)."""
    import numpy as np

    yy, xx = np.mgrid[0:ny, 0:nx].astype(np.float64)
    cy, cx = ny / 2.0, nx / 2.0

    def blob(dy, dx):
        r2 = ((yy - cy - dy) / (0.22 * ny)) ** 2 \
            + ((xx - cx - dx) / (0.22 * nx)) ** 2
        return 0.15 + np.exp(-r2)

    return blob(0.0, 0.0), blob(*shift)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="ofot_tpu multi-host worker (one per host/process)")
    p.add_argument("--coordinator", required=True,
                   help="coordinator address, e.g. host0:12355")
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=0,
                   help="force this many virtual CPU devices per process "
                        "(0 = use the platform's real devices)")
    p.add_argument("--platform", choices=["cpu", "default"], default="cpu")
    p.add_argument("--out", required=True, help="result JSON path")
    p.add_argument("--data-root", default=None)
    p.add_argument("--results", default=None)
    p.add_argument("--datasets", default="middlebury-1")
    p.add_argument("--algos", default="GN")
    p.add_argument("--foto-shape", default="48x64")
    p.add_argument("--foto-nt", type=int, default=6)
    p.add_argument("--foto-iters", type=int, default=40)
    p.add_argument("--checkpoint-dir", default=None,
                   help="optional: distributed Orbax checkpoint round-trip "
                        "of the GSPMD solve's sharded state (all processes "
                        "write their own shards, then restore onto the "
                        "global mesh and fingerprint-verify)")
    args = p.parse_args(argv)

    if args.local_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        flags = " ".join(f for f in flags.split()
                         if "host_platform_device_count" not in f)
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{args.local_devices}").strip()

    import jax

    if args.platform == "cpu":
        # sitecustomize pre-imports jax with the axon TPU platform; the
        # config update must land before the first device query
        jax.config.update("jax_platforms", "cpu")

    from ofot_tpu.parallel import multihost

    pid, count = multihost.initialize(args.coordinator,
                                      args.num_processes, args.process_id)
    out: dict = {"process_id": pid, "process_count": count,
                 "global_devices": len(jax.devices()),
                 "local_devices": len(jax.local_devices())}

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ofot_tpu.parallel import gspmd, mesh as mesh_mod

    # --- leg 1: explicit cross-process psum over the global device set ---
    ndev = len(jax.devices())
    m1 = mesh_mod.make_mesh({"data": ndev})
    glob = np.arange(ndev, dtype=np.float32)
    x = jax.make_array_from_callback(
        (ndev,), NamedSharding(m1, P("data")), lambda idx: glob[idx])
    psum_fn = jax.jit(jax.shard_map(
        lambda a: jax.lax.psum(jnp.sum(a), "data"),
        mesh=m1, in_specs=P("data"), out_specs=P()))
    out["psum"] = float(psum_fn(x))
    out["psum_expected"] = float(glob.sum())

    # --- leg 2: GSPMD FOTO solve sharded over the global mesh ----------
    ny, nx = (int(s) for s in args.foto_shape.split("x"))
    ytiles = 2 if ndev % 2 == 0 else 1
    m2 = mesh_mod.spatial_mesh(ytiles, ndev // ytiles)
    rho0, rhoT = _smooth_pair(ny, nx)
    st = gspmd.solve_foto_sharded(
        jnp.asarray(rho0, jnp.float32), jnp.asarray(rhoT, jnp.float32),
        args.foto_nt, m2, max_it=args.foto_iters)
    # crit/iteration are replicated scalars; reduce the sharded potential
    # to a replicated fingerprint inside jit so every process can read it
    out["foto_crit"] = float(st.crit)
    out["foto_iterations"] = int(st.iteration)
    out["foto_phi_l1"] = float(jax.jit(lambda a: jnp.sum(jnp.abs(a)))(st.phi))

    # --- leg 2b: distributed sharded checkpoint round-trip --------------
    if args.checkpoint_dir:
        from ofot_tpu.utils import checkpoint as ckpt

        ckdir = str(Path(args.checkpoint_dir) / "gspmd_state")
        # every process participates: each writes its addressable shards
        ckpt.save_state_orbax(ckdir, st)
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                           sharding=a.sharding), st)
        restored = ckpt.load_state_orbax(ckdir, abstract_state=abstract)
        out["ckpt_phi_l1"] = float(
            jax.jit(lambda a: jnp.sum(jnp.abs(a)))(restored.phi))
        out["ckpt_iteration"] = int(restored.iteration)

    # --- leg 3: this host's partition of the benchmark sweep -----------
    if args.data_root and args.results:
        from ofot_tpu.cli import pipeline

        rc = pipeline.main([
            "run", "--data-root", args.data_root, "--results", args.results,
            "--datasets", args.datasets, "--algos", args.algos,
            "--platform=cpu", "--host-id", str(pid),
            "--host-count", str(count)])
        out["sweep_rc"] = rc
        out["manifest"] = str(Path(args.results) /
                              (f"manifest.{pid}.json" if count > 1
                               else "manifest.json"))

    # keep shutdown clean: no process exits while a peer still has
    # collectives in flight
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("ofot-worker-done")

    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
