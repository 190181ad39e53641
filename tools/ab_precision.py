"""A/B: DCT stepA transform precision HIGHEST (6-pass f32) vs HIGH (3-pass)
on the real chip, at the production shape and at 1080p.

Run:  python tools/ab_precision.py [--iters 200] [--shapes prod,1080p]
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
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--shapes", default="prod,1080p")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from ofot_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    from ofot_tpu.solvers import foto
    from bench import blob_pair

    shapes = {"prod": (16, 240, 320), "1080p": (16, 1080, 1920),
              "4k": (16, 2160, 3840)}
    precisions = {"HIGHEST": None, "HIGH": jax.lax.Precision.HIGH}

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    for shape_name in args.shapes.split(","):
        Nt, ny, nx = shapes[shape_name]
        f1, f2 = blob_pair(ny, nx, np.float32)
        f1, f2 = f1 / f1.sum(), f2 / f2.sum()
        s = max(f1.max(), f2.max())
        rho0, rhoT = jnp.asarray(f1 / s), jnp.asarray(f2 / s)

        for prec_name, prec in precisions.items():
            ops = foto.DCTOps(precision=prec)

            @jax.jit
            def run(rho0, rhoT, ops=ops):
                st = foto.init_state(rho0, rhoT, Nt)

                def body(_, s):
                    return foto.alg2_iteration(
                        s, rho0, rhoT, r=1.0, reg_epsilon=1e-2,
                        convergence_tol=0.0, cg_rtol=1e-6,
                        cg_maxiter=1000, ops=ops)

                st = lax.fori_loop(0, args.iters, body, st)
                return st.crit

            t0 = time.time()
            crit = float(run(rho0, rhoT))
            comp = time.time() - t0
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.time()
                c = float(run(rho0, rhoT))
                best = min(best, time.time() - t0)
            print(f"{shape_name:6s} {prec_name:8s} compile {comp:6.1f}s  "
                  f"best {best:7.3f}s ({best / args.iters * 1e3:6.2f} "
                  f"ms/iter)  crit={crit:.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
