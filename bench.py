"""Benchmark: FOTO ALG2 throughput at the reference's production config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the run.sh production configuration (320x240 half-res frames,
Nt=16, reference run.sh:114) — a fixed number of full ALG2 iterations
(stepA CG at rtol=1e-6/maxiter=1000 exactly like the reference's scipy cg
call, stepB projection, stepC, HJ criterion), fully jitted, fp32.

Metric: space-time grid-point iterations per second = Nt*Ny*Nx * iters /
wall.  Baseline: the reference CPU measurement of 0.28 s per ALG2 iteration
at 64x48, Nt=8 (BASELINE.md) = 24576 / 0.28 = 87,771 grid-point-iters/s —
stepB's pure-Python projection loop dominates it (~80%), and its cost is
linear in grid points, so the rate extrapolates to the production shape
(where the reference's CG share only grows).

Everything runs inside a single jit (eager dispatch through the TPU tunnel
is minutes-slow — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# reference CPU rate, grid-point iterations / second (BASELINE.md)
BASELINE_PTS_PER_S = 24576 / 0.28


def blob_pair(ny, nx, dtype):
    y, x = np.mgrid[0:ny, 0:nx].astype(dtype)

    def blob(cy, cx):
        return np.exp(-(((y - cy) / (ny / 6)) ** 2
                        + (((x - cx) / (nx / 6)) ** 2)))

    return (blob(ny / 2 - ny / 12, nx / 2 - nx / 12),
            blob(ny / 2 + ny / 12, nx / 2 + nx / 12))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ny", type=int, default=240)
    p.add_argument("--nx", type=int, default=320)
    p.add_argument("--Nt", type=int, default=16)
    p.add_argument("--iters", type=int, default=200,
                   help="ALG2 iterations per timed call; default matches "
                        "the reference production --max-it=200 (run.sh:114) "
                        "— a real solve runs its full iteration budget "
                        "inside one device program, so the per-call "
                        "dispatch latency (~20 ms through this "
                        "environment's TPU tunnel) amortizes exactly as "
                        "it does in production")
    p.add_argument("--repeats", type=int, default=5,
                   help="best-of-N wall timing; 5 (VERDICT r3 item 2 — "
                        "3 was too noisy through the tunnel)")
    p.add_argument("--platform", help="force JAX platform")
    p.add_argument("--cg-rtol", type=float, default=1e-6)
    p.add_argument("--cg-maxiter", type=int, default=1000)
    p.add_argument("--algo", choices=["foto", "GN"], default="foto",
                   help="GN benchmarks the full variational solve instead")
    p.add_argument("--ops", choices=["dct", "pallas", "dct-refined"],
                   default="dct",
                   help="primary stepA/pointwise op set to time")
    p.add_argument("--batch", type=int, default=1,
                   help="solve B independent pairs per call (vmapped — the "
                        "TPU form of run.sh's sequential per-sequence loop); "
                        "throughput counts all B pairs")
    p.add_argument("--no-families", action="store_true",
                   help="skip the GN/WFR/sinkhorn chain-marginal metrics "
                        "(three extra N/5N program pairs)")
    p.add_argument("--with-cg", action="store_true",
                   help="also time the reference-faithful CG stepA path "
                        "(extra compile; stderr only)")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ofot_tpu.utils.compile_cache import (default_cache_dir,
                                              enable as enable_cache)
    enable_cache()
    import jax.numpy as jnp
    from jax import lax
    from ofot_tpu.solvers import foto

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    # compile-cache diagnostics (VERDICT.md r2 weak #6: the 975 s r2
    # compile): report whether the persistent cache can help this run.
    # The cache now defaults to a repo-local dir (compile_cache.py) so it
    # survives across driver rounds — a session that ran the bench leaves
    # a warm cache for the next round's run.  Entry counts before/after
    # each timed phase below distinguish "cache hit" (fast compile, no new
    # entry) from "cold compile" and from pure remote-compiler latency
    # (new entry, wall >> typical).
    import os as _os
    cache_dir = default_cache_dir()
    def cache_entries():
        try:
            return len(_os.listdir(cache_dir))
        except OSError:
            return -1
    print(f"compile cache: {cache_dir} ({cache_entries()} entries)",
          file=sys.stderr)

    if args.algo == "GN":
        return bench_gn(args)

    f1, f2 = blob_pair(args.ny, args.nx, np.float32)
    # mass-normalize the pair (the OT problem's well-posed form,
    # reference bin/normalize_image.py semantics)
    f1 = f1 / f1.sum()
    f2 = f2 / f2.sum()
    scale = max(f1.max(), f2.max())
    rho0 = jnp.asarray(f1 / scale)
    rhoT = jnp.asarray(f2 / scale)
    Nt, iters = args.Nt, args.iters

    if args.batch > 1:
        # B slightly shifted copies of the pair: independent problems, same
        # shape (run.sh's per-sequence loop as one batched device program)
        rho0 = jnp.stack([jnp.roll(rho0, i, axis=1)
                          for i in range(args.batch)])
        rhoT = jnp.stack([jnp.roll(rhoT, i, axis=1)
                          for i in range(args.batch)])

    def make_run(ops, iters=iters):
        def one(rho0, rhoT):
            st = foto.init_state(rho0, rhoT, Nt)

            def body(_, s):
                return foto.alg2_iteration(
                    s, rho0, rhoT, r=1.0, reg_epsilon=1e-2,
                    convergence_tol=0.0,      # fixed-iteration benchmark
                    cg_rtol=args.cg_rtol, cg_maxiter=args.cg_maxiter,
                    ops=ops)

            st = lax.fori_loop(0, iters, body, st)
            return st.crit, st.cg_iterations

        if args.batch > 1:
            batched = jax.vmap(one)
            return jax.jit(lambda a, b: jax.tree.map(jnp.max, batched(a, b)))
        return jax.jit(one)

    def time_run(run):
        # NOTE: time via an actual host read (float()) — on this
        # experimental remote platform block_until_ready can return
        # without waiting for scalar outputs
        n0 = cache_entries()
        t0 = time.time()
        crit, inner = run(rho0, rhoT)
        crit = float(crit)
        compile_s = time.time() - t0
        n1 = cache_entries()
        print(f"  first call {compile_s:.1f}s; cache entries {n0} -> {n1} "
              f"({'persistent-cache hit' if n1 == n0 else 'cold compile'})",
              file=sys.stderr)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            c, i = run(rho0, rhoT)
            float(c), int(i)
            best = min(best, time.time() - t0)
        return best, crit, int(inner), compile_s

    # primary: spectral stepA (the TPU-native fast path); --ops pallas adds
    # the fused stepB+stepC+criterion VMEM kernel
    primary = foto.stepA_ops(args.ops)
    best, crit, inner, comp = time_run(make_run(primary))
    print(f"[{args.ops}] compile {comp:.1f}s  best {best:.3f}s "
          f"({best / iters * 1e3:.2f} ms/iter)  crit={crit:.4f}",
          file=sys.stderr)
    # secondary: reference-faithful CG stepA, for the record
    if args.with_cg:
        try:
            best_cg, crit_cg, inner_cg, comp_cg = time_run(
                make_run(foto.DEFAULT_OPS))
            print(f"[cg ] compile {comp_cg:.1f}s  best {best_cg:.3f}s "
                  f"({best_cg / iters * 1e3:.2f} ms/iter)  crit={crit_cg:.4f}"
                  f"  cg_iters={inner_cg}", file=sys.stderr)
        except Exception as e:     # pragma: no cover
            print(f"[cg ] failed: {e}", file=sys.stderr)

    # tunnel-free device time: time the same program at 5x the iteration
    # count and take the marginal cost (t_5N - t_N) / 4N — the constant
    # per-call overhead (remote dispatch, host read; measured ~25 ms even
    # on healthy days, i.e. ~0.13 ms/iter of pure inflation at N=200)
    # cancels exactly, so this number is comparable across tunnel-health
    # phases where the raw wall rate swings by 3x (VERDICT.md r3 weak #1).
    # The 5x spread keeps the +-tens-of-ms wall noise below ~0.05 ms/iter
    # in the estimate (a 2x spread drowned in it).
    # the subtraction already cancels the dispatch constant, so the long
    # arm needs fewer repeats — keeps the 5x program from dominating the
    # bench's device time (review, round 4)
    args.repeats = max(2, args.repeats // 2)
    best5, _, _, _ = time_run(make_run(primary, iters=5 * iters))
    marginal_ms = (best5 - best) / (4 * iters) * 1e3
    print(f"[{args.ops}] 5x-iters best {best5:.3f}s -> marginal "
          f"{marginal_ms:.3f} ms/iter (device-time estimate; raw "
          f"{best / iters * 1e3:.2f})", file=sys.stderr)

    pts = args.Nt * args.ny * args.nx * iters * args.batch
    rate = pts / best

    out = {
        "metric": "foto_alg2_gridpoint_iters_per_s",
        "value": round(rate, 1),
        "unit": "grid-point-iterations/s",
        "vs_baseline": round(rate / BASELINE_PTS_PER_S, 2),
        "device_ms_per_iter_marginal": round(marginal_ms, 4),
        "wall_ms_per_iter": round(best / iters * 1e3, 4),
    }
    if not args.no_families:
        try:
            out.update(bench_families(args, rho0, rhoT))
        except Exception as e:        # pragma: no cover — the primary
            # metric line must survive a family-leg failure (e.g. a
            # degraded-tunnel hang surfacing as a remote error)
            print(f"bench_families failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            out["families_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(out))
    return 0


def bench_families(args, rho0, rhoT) -> dict:
    """Chain-marginal device-time estimates for the OTHER three solver
    families (VERDICT.md r4 item 9) — one extra N/5N program pair each,
    all hitting the persistent compile cache on repeat runs.

    * ``gn_ms_device``: full GN solve, chained inside one program (each
      repetition's input is perturbed by the previous solution so XLA
      cannot collapse the chain).
    * ``wfr_ms_per_iter_device``: unbalanced ALG2 iteration (4-component
      state) at the production sweep delta=2.5, fixed-iteration
      fori_loop like the FOTO metric.
    * ``sinkhorn_us_per_iter_device``: log-domain Sinkhorn iteration at
      the production frame-scale eps=100 (annealed production solves run
      the same executable per stage).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from ofot_tpu.solvers import foto, gn, sinkhorn, wfr

    if rho0.ndim == 3:                      # families are single-pair
        rho0, rhoT = rho0[0], rhoT[0]
    results = {}

    def marginal(make, n, reps=3, scale=1e3):
        fns = {k: jax.jit(make(k)) for k in (n, 5 * n)}
        best = {}
        for k, fn in fns.items():
            t0 = time.time()
            float(jnp.asarray(fn(rho0, rhoT)).ravel()[0])
            print(f"    first call ({k} reps) {time.time() - t0:.1f}s",
                  file=sys.stderr)
            b = float("inf")
            for _ in range(reps):
                t0 = time.time()
                float(jnp.asarray(fn(rho0, rhoT)).ravel()[0])
                b = min(b, time.time() - t0)
            best[k] = b
        return (best[5 * n] - best[n]) / (4 * n) * scale

    # GN: chain full solves (the solution feeds the next input's
    # perturbation — data dependence defeats CSE).  Same textured
    # workload + rtol as bench_gn / the BENCHMARKS.md r4 table (~153 PCG
    # its) — the smooth blob pair exercises a different CG count.
    yy, xx = np.mgrid[0:args.ny, 0:args.nx].astype(np.float32)
    t1 = (np.sin(xx / 7.0) + np.cos(yy / 5.0)
          + np.sin((xx + yy) / 11.0) + 3) / 6
    t2 = np.roll(np.roll(t1, 2, axis=0), 3, axis=1)
    t1, t2 = jnp.asarray(t1), jnp.asarray(t2)

    def make_gn(reps):
        def run(a, b):
            del a, b
            def body(_, u):
                r = gn.solve_fields(t1 + 1e-6 * u, t2, 0.1, 0.2, rtol=1e-7)
                return r.u
            return jnp.sum(lax.fori_loop(0, reps, body, jnp.zeros_like(t1)))
        return run

    # chain lengths scale with --iters so a reduced smoke run stays
    # cheap; the defaults (iters=200) give N=4/40/400
    print("  [gn chain]", file=sys.stderr)
    results["gn_ms_device"] = round(
        marginal(make_gn, max(2, args.iters // 50)), 4)

    # WFR: fixed-iteration unbalanced ALG2 (production sweep delta=2.5)
    wops = foto.stepA_ops("dct")

    def make_wfr(iters):
        def run(a, b):
            st = wfr.init_state(a, b, args.Nt)

            def body(_, s):
                return wfr.alg2_iteration(
                    s, a, b, r=1.0, delta=2.5, reg_epsilon=1e-2,
                    convergence_tol=0.0, cg_rtol=args.cg_rtol,
                    cg_maxiter=args.cg_maxiter, ops=wops)
            return lax.fori_loop(0, iters, body, st).crit
        return run

    print("  [wfr iters]", file=sys.stderr)
    results["wfr_ms_per_iter_device"] = round(
        marginal(make_wfr, max(2, args.iters // 5)), 4)

    # Sinkhorn: fixed-iteration log-domain updates at frame-scale eps
    def make_sk(iters):
        def run(a, b):
            r = sinkhorn._solve_impl(a, b, 100.0, max_iter=iters,
                                     tol=0.0, check_every=iters)
            return r.marginal_error
        return run

    print("  [sinkhorn iters]", file=sys.stderr)
    results["sinkhorn_us_per_iter_device"] = round(
        marginal(make_sk, max(4, args.iters * 2), scale=1e6), 3)
    return results


def bench_gn(args) -> int:
    """Full GN solve at 320x240 vs the reference's measured 11.85 s
    (1.43 s assemble + 10.42 s spsolve, BASELINE.md)."""
    import jax
    import jax.numpy as jnp
    from ofot_tpu.solvers import gn

    BASELINE_GN_S = 1.43 + 10.42
    # textured pair (GN's realistic regime — smooth blobs converge in a
    # handful of PCG iterations and would overstate the speedup)
    y, x = np.mgrid[0:args.ny, 0:args.nx].astype(np.float32)
    f1 = (np.sin(x / 7.0) + np.cos(y / 5.0) + np.sin((x + y) / 11.0) + 3) / 6
    f2 = np.roll(np.roll(f1, 2, axis=0), 3, axis=1)
    a, b = jnp.asarray(f1), jnp.asarray(f2)

    @jax.jit
    def run(p, q):
        r = gn.solve_fields(p, q, 0.1, 0.2, rtol=1e-7)
        # one stacked probe scalarizes the host read: each device->host
        # fetch costs a full tunnel roundtrip (~20 ms), so fetch once
        probe = jnp.stack([r.cg.residual, r.u[0, 0],
                           r.cg.iterations.astype(p.dtype)])
        return r, probe

    t0 = time.time()
    r, probe = run(a, b)
    _ = np.asarray(probe)             # force host read (see time_run note)
    print(f"compile+first: {time.time() - t0:.1f}s  iters "
          f"{int(r.cg.iterations)} converged {bool(r.cg.converged)}",
          file=sys.stderr)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.time()
        _, probe = run(a, b)
        np.asarray(probe)
        best = min(best, time.time() - t0)
    print(f"best wall: {best:.4f}s", file=sys.stderr)
    # the reference baseline was measured at exactly 320x240; an
    # absolute-seconds metric at another shape must not claim that speedup
    at_baseline_shape = (args.ny, args.nx) == (240, 320)
    print(json.dumps({
        "metric": f"gn_solve_seconds_{args.nx}x{args.ny}",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": (round(BASELINE_GN_S / best, 2)
                        if at_baseline_shape else None),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
