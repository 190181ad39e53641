"""A/B: per-axis DCT application — moveaxis+right-matmul (current) vs
direct contraction via dot_general/einsum (no materialized transpose) —
timed as the full stepA solve (dct3 -> divide -> idct3) on the real chip.

Run:  python tools/ab_transform.py [--shapes prod,1080p]
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
    p.add_argument("--shapes", default="prod,1080p")
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from ofot_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    from ofot_tpu.solvers import dct

    shapes = {"prod": (16, 240, 320), "1080p": (8, 1080, 1920)}
    prec = jax.lax.Precision.HIGHEST

    def solve_current(F, spec, mats):
        # spec divide replaced by a bounded scale: the orthonormal
        # roundtrip keeps the iterated field stable (a real 1/spec divide
        # compounds 1/(r*eps) per rep and overflows by rep ~3)
        return dct._idct3_solve(dct._dct3_solve(F) * spec)

    def solve_einsum(F, spec, mats):
        Ct, Cy, Cx = mats
        # forward: contract each axis against the analysis matrix directly
        y = jnp.einsum("ta,ayx->tyx", Ct, F, precision=prec)
        y = jnp.einsum("yb,tbx->tyx", Cy, y, precision=prec)
        y = jnp.einsum("xc,tyc->tyx", Cx, y, precision=prec)
        y = y * spec
        # inverse: synthesis = C^T
        y = jnp.einsum("at,ayx->tyx", Ct, y, precision=prec)
        y = jnp.einsum("by,tbx->tyx", Cy, y, precision=prec)
        y = jnp.einsum("cx,tyc->tyx", Cx, y, precision=prec)
        return y

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    for shape_name in args.shapes.split(","):
        Nt, ny, nx = shapes[shape_name]
        F = jnp.asarray(np.random.default_rng(0).standard_normal(
            (Nt, ny, nx)).astype(np.float32))
        spec_raw = dct.stepA_spectrum(Nt, ny, nx, 1.0, 1e-2)
        # bounded stand-in with the same memory/broadcast shape
        spec = jnp.asarray(spec_raw / np.abs(spec_raw).max())
        mats = tuple(dct._analysis_matrix(n, jnp.float32)
                     for n in (Nt, ny, nx))

        for name, fn in (("moveaxis", solve_current),
                         ("einsum  ", solve_einsum)):
            @jax.jit
            def run(F, spec, mats, fn=fn):
                def body(_, acc):
                    return fn(acc, spec, mats)
                return lax.fori_loop(0, args.reps, body, F)

            t0 = time.time()
            out = np.asarray(run(F, spec, mats))
            comp = time.time() - t0
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.time()
                np.asarray(run(F, spec, mats))
                best = min(best, time.time() - t0)
            per = best / args.reps * 1e3
            print(f"{shape_name:6s} {name} compile {comp:6.1f}s  "
                  f"best {best:6.3f}s ({per:6.2f} ms/solve)  "
                  f"checksum {float(abs(out).mean()):.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
