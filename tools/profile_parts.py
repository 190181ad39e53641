"""Per-part on-device timing of one ALG2 iteration's components.

CAVEAT (round 4 — read before trusting these numbers): a single-length
fori_loop wall still contains the ~25 ms per-call dispatch constant
(0.125 ms/rep of pure inflation at 200 reps), which is how round 3
mis-read stepA as "2.4x off its roofline" (it was AT the roofline).
For absolute per-apply device time use the chain-marginal method
(tools/_abutil.py: time N and 5N reps, marginal = (t_5N - t_N)/4N);
this tool's single-length numbers are only comparable to EACH OTHER at
the same rep count.  Parts can also exceed the whole: XLA cross-fuses
them inside the full iteration.

Times each component in its own fori_loop (N reps amortize the tunnel
dispatch; only a scalar probe is fetched), at a chosen shape:

  full   — complete alg2_iteration (PallasOps at >= 4M pts, else DCTOps)
  stepA  — div_st + BC + spectral solve
  grad   — grad_st of phi
  point  — fused stepB+stepC+criterion (Pallas) or unfused XLA equivalent

Run:  python tools/profile_parts.py --shape 1080p [--reps 100]
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
    p.add_argument("--shape", default="1080p",
                   choices=["prod", "1080p", "4k"])
    p.add_argument("--reps", type=int, default=100)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--ops", choices=["dct", "pallas", "auto"],
                   default="auto")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from ofot_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()
    from ofot_tpu.solvers import foto
    from bench import blob_pair

    shapes = {"prod": (16, 240, 320), "1080p": (8, 1080, 1920),
              "4k": (8, 2160, 3840)}
    Nt, ny, nx = shapes[args.shape]
    npts = Nt * ny * nx
    solver = (foto.resolve_stepA_solver("auto", "tpu", npts)
              if args.ops == "auto" else args.ops)
    ops = foto.stepA_ops(solver)
    print(f"device: {jax.devices()[0]}  shape ({Nt},{ny},{nx})  "
          f"ops={solver}", file=sys.stderr)

    f1, f2 = blob_pair(ny, nx, np.float32)
    f1, f2 = f1 / f1.sum(), f2 / f2.sum()
    s = max(f1.max(), f2.max())
    rho0, rhoT = jnp.asarray(f1 / s), jnp.asarray(f2 / s)
    st0 = foto.init_state(rho0, rhoT, Nt)
    r = 1.0

    kw = dict(r=r, reg_epsilon=1e-2, convergence_tol=0.0,
              cg_rtol=1e-6, cg_maxiter=1000, ops=ops)

    def loop_full(st):
        def body(_, s):
            return foto.alg2_iteration(s, rho0, rhoT, **kw)
        st = lax.fori_loop(0, args.reps, body, st)
        return st.crit

    def loop_stepA(st):
        def body(_, carry):
            mu, q = carry
            phi, _ = foto._stepA(mu, q, rho0, rhoT, r, 1e-2, 1e-6, 1000,
                                 ops)
            # feed phi back so reps stay data-dependent, bounded scale
            mu = mu.at[0].mul(0.0).at[0].add(phi * 1e-3)
            return (mu, q)
        mu, q = lax.fori_loop(0, args.reps, body, (st.mu, st.q))
        return jnp.sum(mu[0, 0, :8, :8])

    def loop_grad(st):
        def body(_, phi):
            g = ops.grad_st(phi, bc="N")
            return phi + 1e-6 * g[0]
        phi = lax.fori_loop(0, args.reps, body, st.phi + 1.0)
        return jnp.sum(phi[0, :8, :8])

    def loop_point(st):
        fused = getattr(ops, "fused_pointwise", None)

        def body(_, carry):
            gphi, mu = carry
            if fused is not None:
                q, mu2, num, den = fused(gphi, mu, r)
            else:
                q = ops.project(gphi + mu / r)
                mu2 = mu + r * (gphi - q)
                comp = lax.broadcasted_iota(jnp.int32, mu2.shape, 0)
                mu2 = jnp.where(comp == 0, jnp.maximum(mu2, 0.0), mu2)
                res = gphi[0] + 0.5 * (gphi[1] ** 2 + gphi[2] ** 2)
                num = ops.sum(mu2[0] * jnp.abs(res))
                den = ops.sum(mu2[0] * (gphi[1] ** 2 + gphi[2] ** 2))
            return (gphi + 1e-9 * (num + den), mu2)
        gphi0 = jnp.stack([st.phi, st.phi, st.phi]) * 0.1
        gphi, mu = lax.fori_loop(0, args.reps, body, (gphi0, st.mu))
        return jnp.sum(mu[0, 0, :8, :8])

    for name, fn in (("full ", loop_full), ("stepA", loop_stepA),
                     ("grad ", loop_grad), ("point", loop_point)):
        run = jax.jit(fn)
        t0 = time.time()
        float(run(st0))
        comp = time.time() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            float(run(st0))
            best = min(best, time.time() - t0)
        print(f"{name} compile {comp:6.1f}s  best {best:7.3f}s  "
              f"{best / args.reps * 1e3:7.3f} ms/rep")
    return 0


if __name__ == "__main__":
    sys.exit(main())
