"""A/B experiments on the two 1080p hot spots found by profile_parts.py:

  E1  fused-pointwise Pallas block height (_PROJ_ROWS 8 vs 16 vs 32) —
      is the kernel DMA-latency-bound at (3, 8, cols) blocks?
  E2  stepA transform relayouts: t-axis as a flat (Nt, Ny*Nx) left-matmul
      and y-axis as a direct einsum contraction vs the current
      moveaxis+right-matmul.

Scalar probes only (a full-field fetch costs ~140 ms through the tunnel).

Run:  python tools/ab_hotpath.py [--exp e1,e2] [--reps 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(run, *args, repeats=3):
    t0 = time.time()
    float(run(*args))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(run(*args))
        best = min(best, time.time() - t0)
    return comp, best


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--exp", default="e1,e2")
    p.add_argument("--reps", type=int, default=100)
    p.add_argument("--Nt", type=int, default=8)
    p.add_argument("--ny", type=int, default=1080)
    p.add_argument("--nx", type=int, default=1920)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from ofot_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    from ofot_tpu.ops.pallas import kernels
    from ofot_tpu.solvers import dct

    Nt, ny, nx = args.Nt, args.ny, args.nx
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}  shape ({Nt},{ny},{nx})",
          file=sys.stderr)

    if "e1" in args.exp:
        gphi = jnp.asarray(rng.standard_normal((3, Nt, ny, nx)),
                           jnp.float32) * 0.1
        mu = jnp.abs(jnp.asarray(rng.standard_normal((3, Nt, ny, nx)),
                                 jnp.float32))
        raw = kernels.fused_pointwise_pallas.__wrapped__

        for rows in (8, 16, 32, 64):
            kernels._PROJ_ROWS = rows
            kernels._PROJ_CHUNK = rows * kernels._PROJ_COLS

            def loop(gphi, mu):
                def body(_, carry):
                    g, m = carry
                    q, m2, num, den = raw(g, m, 1.0)
                    return (g + 1e-9 * (num + den), m2)
                g, m = lax.fori_loop(0, args.reps, body, (gphi, mu))
                return jnp.sum(m[0, 0, :8, :8])

            comp, best = timed(jax.jit(loop), gphi, mu)
            print(f"E1 rows={rows:3d}  compile {comp:6.1f}s  "
                  f"best {best:7.3f}s  {best / args.reps * 1e3:7.3f} ms/rep")
        kernels._PROJ_ROWS = 8
        kernels._PROJ_CHUNK = 8 * kernels._PROJ_COLS

    if "e2" in args.exp:
        F = jnp.asarray(rng.standard_normal((Nt, ny, nx)), jnp.float32)
        prec = jax.lax.Precision.HIGHEST
        Ct = dct._analysis_matrix(Nt, jnp.float32)
        Cy = dct._analysis_matrix(ny, jnp.float32)
        Cx = dct._analysis_matrix(nx, jnp.float32)

        def t_move(x, inverse):
            return dct._apply_axis(x, Nt, -3, inverse)

        def t_flat(x, inverse):
            m = Ct.T if inverse else Ct
            return jnp.matmul(m, x.reshape(Nt, ny * nx),
                              preferred_element_type=x.dtype,
                              precision=prec).reshape(Nt, ny, nx)

        def y_move(x, inverse):
            return dct._apply_axis(x, ny, -2, inverse)

        def y_einsum(x, inverse):
            eq = "by,tbx->tyx" if inverse else "yb,tbx->tyx"
            return jnp.einsum(eq, Cy, x, precision=prec,
                              preferred_element_type=x.dtype)

        def x_apply(x, inverse):
            return dct._apply_axis(x, nx, -1, inverse)

        variants = {
            "current      ": (t_move, y_move),
            "t-flat       ": (t_flat, y_move),
            "y-einsum     ": (t_move, y_einsum),
            "t-flat+y-ein ": (t_flat, y_einsum),
        }
        for name, (tf, yf) in variants.items():
            def loop(F, tf=tf, yf=yf):
                def body(_, x):
                    y = x_apply(yf(tf(x, False), False), False)
                    y = y * (1.0 / (Nt * ny * nx))  # keep scale bounded
                    return tf(yf(x_apply(y, True), True), True)
                x = lax.fori_loop(0, args.reps, body, F)
                return jnp.sum(x[0, :8, :8])

            comp, best = timed(jax.jit(loop), F)
            print(f"E2 {name}  compile {comp:6.1f}s  best {best:7.3f}s  "
                  f"{best / args.reps * 1e3:7.3f} ms/rep")
    return 0


if __name__ == "__main__":
    sys.exit(main())
