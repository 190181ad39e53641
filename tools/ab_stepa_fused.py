"""A/B the fused-Pallas spectral stepA against the XLA spectral solve.

VERDICT.md r3 item 1: stepA measured 0.312 ms at (16, 240, 320) vs a
~0.13 ms HBM+MXU roofline.  This tool times, at any shape:

  * stepA alone: N chained solves (output feeds the next input, so no
    DCE) per jitted call, for the XLA 6-pass solve vs the fused kernel;
  * the full ALG2 iteration under each ops set (the bench.py workload).

Run on the real chip:  python tools/ab_stepa_fused.py [--shape prod|hd]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="prod", choices=["prod", "hd"])
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--platform")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ofot_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    import jax.numpy as jnp
    from jax import lax
    from ofot_tpu.solvers import foto
    from ofot_tpu.ops.pallas import kernels
    from ofot_tpu.solvers import dct

    Nt, Ny, Nx = (16, 240, 320) if args.shape == "prod" else (8, 1080, 1920)
    iters = args.iters if args.shape == "prod" else max(args.iters // 10, 20)
    print(f"device {jax.devices()[0]}  shape ({Nt}, {Ny}, {Nx})  "
          f"iters/call {iters}", file=sys.stderr)

    rng = np.random.default_rng(7)
    F0 = jnp.asarray(rng.standard_normal((Nt, Ny, Nx)).astype(np.float32))

    def timed(name, fn, *a):
        t0 = time.time()
        out = fn(*a)
        probe = float(jnp.asarray(out).ravel()[0])
        comp = time.time() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            out = fn(*a)
            float(jnp.asarray(out).ravel()[0])
            best = min(best, time.time() - t0)
        print(f"[{name:>14}] compile {comp:6.1f}s  best {best*1e3:8.2f} ms "
              f"({best / iters * 1e3:6.3f} ms/apply)  probe={probe:.3e}",
              file=sys.stderr)
        return best

    # --- stepA alone: chained applications.  The solve's smallest
    # eigenvalue is r*eps = 1e-2, so chaining raw solves amplifies ~100x
    # per apply and overflows; renormalize by max|.| each step (identical
    # extra cost in both variants)
    def chain(solver, n):
        def run(F):
            def body(_, x):
                y = solver(x, 1.0, 1e-2)
                return y / jnp.max(jnp.abs(y))
            return lax.fori_loop(0, n, body, F)
        return jax.jit(run)

    # two chain lengths per variant: the marginal (t_5N - t_N) / 4N is
    # free of the per-call dispatch constant, which through this
    # environment's tunnel can rival the compute itself
    t_xla = timed("stepA xla", chain(dct.solve_stepA_dct, iters), F0)
    t_xla5 = timed("stepA xla 5x", chain(dct.solve_stepA_dct,
                                         5 * iters), F0)
    t_fus = timed("stepA fused", chain(kernels.dct_solve_pallas, iters), F0)
    t_fus5 = timed("stepA fused 5x", chain(kernels.dct_solve_pallas,
                                           5 * iters), F0)
    mx = (t_xla5 - t_xla) / (4 * iters) * 1e3
    mf = (t_fus5 - t_fus) / (4 * iters) * 1e3
    print(f"stepA marginal ms/apply: xla {mx:.4f}  fused {mf:.4f}  "
          f"speedup {mx / mf:.2f}x (raw-wall {t_xla / t_fus:.2f}x)",
          file=sys.stderr)

    # --- full ALG2 iteration under each ops set
    y, x = np.mgrid[0:Ny, 0:Nx].astype(np.float32)

    def blob(cy, cx):
        return np.exp(-(((y - cy) / (Ny / 6)) ** 2
                        + ((x - cx) / (Nx / 6)) ** 2))

    f1 = blob(Ny / 2 - Ny / 12, Nx / 2 - Nx / 12)
    f2 = blob(Ny / 2 + Ny / 12, Nx / 2 + Nx / 12)
    f1, f2 = f1 / f1.sum(), f2 / f2.sum()
    scale = max(f1.max(), f2.max())
    rho0 = jnp.asarray(f1 / scale)
    rhoT = jnp.asarray(f2 / scale)

    class _OldPallas(foto.DCTOps):      # XLA dct stepA + pallas pointwise
        project = staticmethod(foto.PallasOps.project)
        project_nd = project
        fused_pointwise = staticmethod(foto.PallasOps.fused_pointwise)

    variants = [("dct (xla)", foto.DCT_OPS),
                ("dct-fused", foto.DCTFusedOps()),
                ("fused+ptw", foto.PALLAS_OPS),
                ("xla+ptw", _OldPallas())]

    for name, ops in variants:
        def run(a, b, ops=ops):
            st = foto.init_state(a, b, Nt)

            def body(_, s):
                return foto.alg2_iteration(
                    s, a, b, r=1.0, reg_epsilon=1e-2, convergence_tol=0.0,
                    ops=ops)
            st = lax.fori_loop(0, iters, body, st)
            return st.crit
        timed(f"alg2 {name}", jax.jit(run), rho0, rhoT)
    return 0


if __name__ == "__main__":
    sys.exit(main())
