"""Three-way batched-sweep execution A/B: vmap vs lax.map vs sequential.

VERDICT.md r4 item 2.  Round-4 marginals showed single-chip vmap batching
HALVES per-pair device throughput (0.615 vs 0.306 ms per pair-iteration
at the production shape — the lockstep batch's ~16 MB/pair working set
spills VMEM), while a warm *sequential* solve pays the ~25 ms dispatch
constant per pair (~50% of wall at 200 its).  The third point on that
curve is ``lax.map``: pairs solved sequentially INSIDE one jitted program
— full per-pair VMEM residency AND one dispatch for the whole batch.

Methodology: bench.py's fixed-iteration fori_loop of ``alg2_iteration``
(no convergence exit), chain-marginal timing (N vs 5N iterations, the
per-call constant cancels — tools/_abutil.py).

Run on the real chip:  python tools/ab_batch_map.py [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _abutil import blob_pair, timed


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=40,
                   help="base iteration count N (marginal uses N and 5N)")
    p.add_argument("--repeats", type=int, default=4)
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

    Nt, Ny, Nx = 16, 240, 320
    B, N = args.batch, args.iters
    print(f"device {jax.devices()[0]}  shape ({Nt}, {Ny}, {Nx})  "
          f"B={B}  N={N}", file=sys.stderr)

    f1, f2 = blob_pair(Ny, Nx)
    rho0 = jnp.stack([jnp.roll(jnp.asarray(f1), i, axis=1)
                      for i in range(B)])
    rhoT = jnp.stack([jnp.roll(jnp.asarray(f2), i, axis=1)
                      for i in range(B)])
    ops = foto.stepA_ops("dct")

    def one(iters):
        def run(a, b):
            st = foto.init_state(a, b, Nt)

            def body(_, s):
                return foto.alg2_iteration(
                    s, a, b, r=1.0, reg_epsilon=1e-2,
                    convergence_tol=0.0, cg_rtol=1e-6, cg_maxiter=30,
                    ops=ops)
            st = lax.fori_loop(0, iters, body, st)
            return st.crit
        return run

    results = {}
    walls = {}
    for mode in ("vmap", "map"):
        lift = (jax.vmap if mode == "vmap"
                else (lambda f: (lambda a, b:
                                 lax.map(lambda ab: f(*ab), (a, b)))))
        tN = timed(f"{mode} N", jax.jit(lift(one(N))), rho0, rhoT,
                   repeats=args.repeats)
        t5 = timed(f"{mode} 5N", jax.jit(lift(one(5 * N))), rho0, rhoT,
                   repeats=args.repeats)
        results[mode] = (t5 - tN) / (4 * N * B) * 1e3
        walls[mode] = t5 / B           # per-pair wall at 5N its

    # sequential: one single-pair program, B dispatches per timing
    for tag, iters in (("N", N), ("5N", 5 * N)):
        fn = jax.jit(one(iters))
        t0 = time.time()
        probe = float(jnp.asarray(fn(rho0[0], rhoT[0])).ravel()[0])
        print(f"[seq {tag}] compile {time.time()-t0:6.1f}s "
              f"probe={probe:.3e}", file=sys.stderr)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            for i in range(B):
                out = fn(rho0[i], rhoT[i])
            float(jnp.asarray(out).ravel()[0])
            best = min(best, time.time() - t0)
        if tag == "N":
            tN = best
        else:
            t5 = best
    results["sequential"] = (t5 - tN) / (4 * N * B) * 1e3
    walls["sequential"] = t5 / B

    out = {"tool": "ab_batch_map", "batch": B, "iters": N,
           "ms_per_pair_iter_marginal": {k: round(v, 4)
                                         for k, v in results.items()},
           "wall_s_per_pair_at_5N": {k: round(v, 4)
                                     for k, v in walls.items()}}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
