"""A/B the blocked Pallas CG operator against the XLA stencil body.

VERDICT.md r3 item 5: does the DMA-halo blocked kernel (a) compile on
the real Mosaic backend (the whole-array concat form did not) and
(b) beat the XLA stencil?  Chain marginals at two lengths remove the
per-call dispatch constant (see tools/_abutil.py).

    python tools/ab_cg_pallas.py [--shape prod|hd]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _abutil import chain, timed


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="prod", choices=["prod", "hd"])
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--platform")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ofot_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    import jax.numpy as jnp
    from ofot_tpu.ops import operators
    from ofot_tpu.ops.pallas import kernels

    Nt, Ny, Nx = (16, 240, 320) if args.shape == "prod" else (8, 1080, 1920)
    iters = args.iters if args.shape == "prod" else max(args.iters // 8, 20)
    print(f"device {jax.devices()[0]}  shape ({Nt}, {Ny}, {Nx})  "
          f"iters {iters}", file=sys.stderr)

    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.standard_normal((Nt, Ny, Nx)).astype(np.float32))

    def op_xla(x, r, eps):
        return -r * operators.laplacian_st(x, bc="N") + (r * eps) * x

    # correctness probe on-chip first — ONE jitted program returning the
    # scalar error (an eager stencil + compare costs ~10 min of tunnel
    # round-trips; .claude/skills/verify/SKILL.md round-4 note)
    @jax.jit
    def probe(x):
        return jnp.abs(op_xla(x, 1.0, 1e-2)
                       - kernels.cg_operator_pallas_blocked(x, 1.0, 1e-2)
                       ).max()
    print(f"on-chip max err vs XLA: {float(probe(x0)):.3e}",
          file=sys.stderr)

    rep = args.repeats
    t_x1 = timed("spmv xla", chain(op_xla, iters), x0, repeats=rep)
    t_x5 = timed("spmv xla 5x", chain(op_xla, 5 * iters), x0, repeats=rep)
    t_p1 = timed("spmv pallas", chain(kernels.cg_operator_pallas_blocked,
                                      iters), x0, repeats=rep)
    t_p5 = timed("spmv pallas 5x", chain(kernels.cg_operator_pallas_blocked,
                                         5 * iters), x0, repeats=rep)
    mx = (t_x5 - t_x1) / (4 * iters) * 1e3
    mp = (t_p5 - t_p1) / (4 * iters) * 1e3
    gb = Nt * Ny * Nx * 4 * 2 / 1e9    # read + write per apply
    print(f"marginal ms/apply: xla {mx:.4f} ({gb/mx*1e3:.0f} GB/s)  "
          f"pallas {mp:.4f} ({gb/mp*1e3:.0f} GB/s)  "
          f"xla/pallas {mx/mp:.2f}x", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
