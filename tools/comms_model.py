"""Communication model of the tiled solvers — analytic + compiled-HLO audit.

Real multi-chip hardware is unavailable in this environment (one tunneled
chip), so the ">= 80% scaling efficiency" north star (BASELINE.json) is
made auditable two ways:

  1. ANALYTIC: per-ALG2-iteration halo bytes and psum counts of the
     shard_map CG path, per device, as a function of (Nt, Ny, Nx, py, px)
     — every term read directly off the implementation
     (ofot_tpu/parallel/halo.py, ofot_tpu/solvers/cg.py).
  2. COMPILED: the same program is jitted for an 8-device virtual CPU
     mesh and its optimized HLO is scanned for collective ops — the
     numbers the analytic model predicts must actually appear in the
     program XLA runs (while_loop bodies count once; the loop multiplies
     them at runtime).

Run: python tools/comms_model.py [--ny 240 --nx 320 --Nt 16 --py 2 --px 2]
(forces the CPU platform; safe to run alongside nothing — it never
touches the TPU).  The output backs SCALING.md.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def analytic(Nt, ny, nx, py, px, cg_iters, itemsize=4):
    """Per-device, per-ALG2-iteration comms of the CG-stepA tiled path."""
    tile_y, tile_x = ny // py, nx // px
    # one halo line: the tile face orthogonal to the shifted axis
    line_x = Nt * tile_y * itemsize          # shift along x
    line_y = Nt * tile_x * itemsize          # shift along y
    # lap1d_halo / grad_central_weird_halo: 2 shifts per sharded axis
    lap_bytes = 2 * line_x + 2 * line_y      # laplacian_st apply
    grad_bytes = 2 * line_x + 2 * line_y     # grad_st apply (gx + gy)
    div_bytes = 2 * line_x + 2 * line_y      # div_st apply (m1 + m2)

    # stepA: RHS div_st (1 apply) + CG [setup 2 psums; per iter: 1
    # laplacian apply + 2 psums (cg.py body: p.q and r.z)]
    stepA_bytes = div_bytes + cg_iters * lap_bytes
    stepA_psums = 2 + 2 * cg_iters
    # after stepA: grad_st (1 apply); criterion: 2 psums (num, denom)
    iter_bytes = stepA_bytes + grad_bytes
    iter_psums = stepA_psums + 2
    return {
        "tile": (Nt, tile_y, tile_x),
        "halo_line_bytes_x": line_x,
        "halo_line_bytes_y": line_y,
        "stencil_apply_bytes": lap_bytes,
        "alg2_iter_halo_bytes": iter_bytes,
        "alg2_iter_psums": iter_psums,
        "field_bytes_per_tile": Nt * tile_y * tile_x * itemsize,
    }


def compiled_collective_counts(Nt, ny, nx, py, px):
    """Compile the production tiled solver for a virtual (py, px) CPU mesh
    and count collective ops in the optimized HLO."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{py * px}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ofot_tpu.parallel import foto_sharded
    from ofot_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"y": py, "x": px})
    fn = foto_sharded._tiled_fn(mesh, Nt, 1.0, 0.01, 1e-2, 100, 1e-6, 1000)
    z = jnp.zeros((ny, nx), jnp.float32)
    hlo = fn.lower(z, z).compile().as_text()
    counts = {}
    for op in ("collective-permute", "all-reduce", "all-gather",
               "reduce-scatter", "all-to-all"):
        counts[op] = hlo.count(f" {op}")
    return counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ny", type=int, default=240)
    p.add_argument("--nx", type=int, default=320)
    p.add_argument("--Nt", type=int, default=16)
    p.add_argument("--py", type=int, default=2)
    p.add_argument("--px", type=int, default=2)
    p.add_argument("--cg-iters", type=int, default=155,
                   help="inner CG iterations per stepA (measured at the "
                        "production rtol=1e-6 on the 16x24 fixture: 155; "
                        "grows ~linearly with grid diameter)")
    args = p.parse_args()

    a = analytic(args.Nt, args.ny, args.nx, args.py, args.px, args.cg_iters)
    print(f"# grid ({args.Nt}, {args.ny}, {args.nx}) on mesh "
          f"(y={args.py}, x={args.px}), cg_iters={args.cg_iters}")
    for k, v in a.items():
        print(f"{k}: {v}")

    print("\n# optimized-HLO collective ops in the tiled ALG2 program "
          "(loop bodies count once):")
    for op, n in compiled_collective_counts(
            args.Nt, args.ny, args.nx, args.py, args.px).items():
        print(f"{op}: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
