"""Quickstart: solve a synthetic pair with both solvers and inspect results.

Run: python examples/quickstart.py [--platform cpu]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ofot_tpu.solvers import foto, gn
    from ofot_tpu.utils import warp, metrics

    # a bright square translating by 4 pixels
    n = 48
    f1 = np.zeros((n, n), np.float32)
    f2 = np.zeros((n, n), np.float32)
    f1[8:24, 8:24] = 1.0
    f2[12:28, 12:28] = 1.0

    print("== FOTO (Benamou-Brenier optimal transport) ==")
    res = foto.solve(jnp.asarray(f1), jnp.asarray(f2), Nt=8, r=1.0,
                     convergence_tol=0.05, reg_epsilon=1e-2, max_it=60,
                     ops=foto.DCT_OPS)
    rec = np.clip(np.asarray(warp.apply_flow(
        jnp.asarray(f1), res.u, res.v, res.m)), 0, 1)
    print(f"  iterations={int(res.state.iteration)} "
          f"crit={float(res.state.crit):.4f} "
          f"IE={metrics.IE(n, n, rec, f2):.3f} "
          f"mean|u|={float(np.abs(np.asarray(res.u)).mean()):.2f}")

    print("== GN (Gennert-Negahdaripour variational) ==")
    r = gn.solve_fields(jnp.asarray(f1), jnp.asarray(f2), 0.1, 0.2)
    rec = np.clip(np.asarray(warp.apply_flow(
        jnp.asarray(f1), r.u, r.v, r.m)), 0, 1)
    print(f"  cg_iterations={int(r.cg.iterations)} "
          f"IE={metrics.IE(n, n, rec, f2):.3f}")


if __name__ == "__main__":
    main()
