"""A/B the fused-Pallas spectral stepA against the XLA spectral solve.

VERDICT.md r3 item 1.  Outcome (v5e, BENCHMARKS.md round 4): the XLA
6-pass solve already sits on the stepA roofline — chain marginals put
both paths at 0.153 ms/apply at the production shape, and the fused
kernel LOSES in the full ALG2 iteration (pallas_call breaks XLA's
div_st -> stepA -> grad_st cross-fusion).  Methodology in
tools/_abutil.py (chain-marginal, per-call constant cancels).

Run on the real chip:  python tools/ab_stepa_fused.py [--shape prod|hd]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _abutil import blob_pair, chain, timed


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="prod", choices=["prod", "hd"])
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--platform")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ofot_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    import jax.numpy as jnp
    from jax import lax
    from ofot_tpu.solvers import foto, dct
    from ofot_tpu.ops.pallas import kernels

    Nt, Ny, Nx = (16, 240, 320) if args.shape == "prod" else (8, 1080, 1920)
    iters = args.iters if args.shape == "prod" else max(args.iters // 10, 20)
    rep = args.repeats
    print(f"device {jax.devices()[0]}  shape ({Nt}, {Ny}, {Nx})  "
          f"iters/call {iters}", file=sys.stderr)

    rng = np.random.default_rng(7)
    F0 = jnp.asarray(rng.standard_normal((Nt, Ny, Nx)).astype(np.float32))

    # --- stepA alone: chained applications at N and 5N -> marginal
    t_x1 = timed("stepA xla", chain(dct.solve_stepA_dct, iters), F0,
                 repeats=rep)
    t_x5 = timed("stepA xla 5x", chain(dct.solve_stepA_dct, 5 * iters),
                 F0, repeats=rep)
    t_f1 = timed("stepA fused", chain(kernels.dct_solve_pallas, iters),
                 F0, repeats=rep)
    t_f5 = timed("stepA fused 5x", chain(kernels.dct_solve_pallas,
                                         5 * iters), F0, repeats=rep)
    mx = (t_x5 - t_x1) / (4 * iters) * 1e3
    mf = (t_f5 - t_f1) / (4 * iters) * 1e3
    print(f"stepA marginal ms/apply: xla {mx:.4f}  fused {mf:.4f}  "
          f"speedup {mx / mf:.2f}x (raw-wall {t_x1 / t_f1:.2f}x)",
          file=sys.stderr)

    # --- full ALG2 iteration under each ops set (raw walls, same program
    # size everywhere so the per-call constant is common-mode)
    f1, f2 = blob_pair(Ny, Nx)
    rho0, rhoT = jnp.asarray(f1), jnp.asarray(f2)

    class _FusedBoth(foto.DCTFusedOps):   # pallas stepA + pallas pointwise
        project = staticmethod(foto.PallasOps.project)
        project_nd = project
        fused_pointwise = staticmethod(foto.PallasOps.fused_pointwise)

    variants = [("dct (xla)", foto.DCT_OPS),
                ("dct-fused", foto.DCTFusedOps()),
                ("xla+ptw", foto.PALLAS_OPS),
                ("fused+ptw", _FusedBoth())]

    for name, ops in variants:
        def run(a, b, ops=ops):
            st = foto.init_state(a, b, Nt)

            def body(_, s):
                return foto.alg2_iteration(
                    s, a, b, r=1.0, reg_epsilon=1e-2, convergence_tol=0.0,
                    ops=ops)
            st = lax.fori_loop(0, iters, body, st)
            return st.crit
        best = timed(f"alg2 {name}", jax.jit(run), rho0, rhoT, repeats=rep)
        print(f"    -> {best / iters * 1e3:.3f} ms/iter raw",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
