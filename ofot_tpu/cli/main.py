"""CLI entry point — drop-in flag surface of the reference's main.py.

Mirrors reference main.py:28-47 exactly (14 flags, same defaults, same
benchmark/output file formats) so run scripts written for the reference work
unchanged, including ``--lambda=...`` resolving to ``--lambdaa`` via
argparse prefix matching (SURVEY.md §2 quirk 4).  TPU-specific additions:
``--precision``, ``--platform``, ``--save-flow-viz`` (host-side Middlebury
color wheel), ``--checkpoint`` / ``--resume`` for long FOTO solves, and
``--profile`` (jax.profiler trace).

Usage:  python -m ofot_tpu.cli.main f0.png f1.png --algo=foto --Nt=16 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="sample argument parser")
    p.add_argument("f0", help="first frame")
    p.add_argument("f1", help="second frame")
    p.add_argument("--out", nargs="?", help="optical flow output")
    p.add_argument("--ground-truth", nargs="?", help="optical flow ground truth")
    p.add_argument("--save-benchmark", nargs="?", help="file output of benchmark")
    p.add_argument("--save-reconstruction", nargs="?",
                   help="file output of reconstruction")
    p.add_argument("--save-lum", nargs="?", help="file output of luminosity")
    # Model parameters (reference defaults)
    p.add_argument("--algo", nargs="?", help="Algorithm")
    p.add_argument("--Nt", nargs="?", type=int, default=4,
                   help="Discretization in time")
    p.add_argument("--r", nargs="?", type=float, default=1.0,
                   help="augmented langrangian parameter")
    p.add_argument("--convergence-tol", nargs="?", type=float, default=0.1,
                   help="Stopping threshold")
    p.add_argument("--reg-epsilon", nargs="?", type=float, default=1e-3,
                   help="Regularization for the step 1 of Benamou-Brenier")
    p.add_argument("--max-it", nargs="?", type=int, default=100,
                   help="Maximal number of iteration")
    p.add_argument("--normalize", action=argparse.BooleanOptionalAction,
                   help="normalize the input images if enabled")
    p.add_argument("--alpha", nargs="?", type=float, default=0.1,
                   help="Horn-Schunck alpha")
    p.add_argument("--lambdaa", nargs="?", type=float, default=0.2,
                   help="Horn-Schunck lambda")
    # --- TPU-framework extensions ---
    p.add_argument("--precision", choices=["f32", "f64"], default="f32",
                   help="compute precision (f64 needs CPU or jax x64)")
    p.add_argument("--platform", nargs="?",
                   help="force a JAX platform, e.g. cpu")
    p.add_argument("--save-flow-viz", nargs="?",
                   help="Middlebury color-wheel PNG of the flow")
    p.add_argument("--checkpoint", nargs="?",
                   help="save final FOTO solver state here (.npz)")
    p.add_argument("--resume", nargs="?",
                   help="resume FOTO from a saved state (.npz)")
    p.add_argument("--profile", nargs="?",
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--quiet", action="store_true",
                   help="suppress per-iteration solver prints")
    p.add_argument("--stepA-solver",
                   choices=["cg", "dct", "dct-refined", "pallas",
                            "dct-fused", "cg-pallas", "auto"],
                   default="auto",
                   help="FOTO stepA backend: cg = reference-faithful "
                        "iterative solve; dct = exact spectral solve (MXU); "
                        "dct-refined = bf16 spectral solve + f32 iterative "
                        "refinement; pallas = dct + fused Pallas "
                        "projection; auto (default) = the measured-fastest "
                        "backend per platform/grid — spectral on TPU "
                        "(24x the cg iteration at 320x240, BENCHMARKS.md), "
                        "cg on cpu/gpu")
    p.add_argument("--admm-alpha", type=float, default=1.0,
                   help="ADMM over-relaxation factor for FOTO (1.0 = exact "
                        "reference iteration; 1.5-1.8 typically converges "
                        "in fewer iterations to the same fixed point)")
    p.add_argument("--log-jsonl", nargs="?",
                   help="append a structured solver-summary record here")
    p.add_argument("--wfr-delta", type=float, default=10.0,
                   help="WFR transport/growth trade-off length in pixels "
                        "(--algo=WFR; mass moves below ~pi*delta/2 px and "
                        "is created/destroyed beyond)")
    p.add_argument("--auto-r", action="store_true",
                   help="rescale the ADMM penalty r to the data scale "
                        "(r * max density).  ALG2 convergence depends on "
                        "r/peak-density, not r: the reference's r=1 "
                        "default assumes peak~1 frames (normalize_image"
                        ".py-prepared); unit-MASS inputs stall without "
                        "this.  Off by default for reference parity")
    p.add_argument("--sinkhorn-epsilon", type=float, default=4.0,
                   help="entropic regularization in px^2 for --algo=sinkhorn "
                        "(f32 envelope: eps >= 3; use --precision=f64 below)")
    p.add_argument("--sinkhorn-tol", type=float, default=1e-4,
                   help="marginal L1 convergence tolerance for "
                        "--algo=sinkhorn")
    p.add_argument("--pyramid-levels", type=int, default=1,
                   help="coarse-to-fine levels for --algo=GN/HS (1 = "
                        "single scale).  The linearized solvers only "
                        "capture a few px of motion; each extra level "
                        "halves the resolution, solves the residual flow "
                        "and warps (solvers/pyramid.py)")
    p.add_argument("--sinkhorn-stabilizer",
                   choices=["auto", "matmul", "exact"], default="auto",
                   help="softmin stabilization for --algo=sinkhorn: "
                        "matmul = two-stage MXU form (fast; f32 envelope "
                        "eps >= potential-spread/88), exact = per-entry "
                        "max-plus shifts (no f32 envelope, ~5-10x/iter), "
                        "auto = matmul first, exact retry if the marginal "
                        "error misses tol (default)")
    p.add_argument("--sinkhorn-theta", type=float, default=1.0,
                   help="over-relaxation of the Sinkhorn dual updates "
                        "(1.0 = classical; measured 1.8x/3.3x/4.6x fewer "
                        "iterations at 1.3/1.5/1.7 on compact "
                        "densities, same fixed point; not useful at "
                        "the f32 frame-scale floor)")
    p.add_argument("--save-growth", nargs="?",
                   help="file output of the WFR growth field (the "
                        "brightness-change map the source term explains)")
    p.add_argument("--save-density-frames", nargs="?",
                   help="directory for the FOTO intermediate density "
                        "trajectory rho_n as PNGs (the transport 'movie' "
                        "the reference sketches in comments, reference "
                        "benamou_brenier.py:262-267)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.precision == "f64":
        jax.config.update("jax_enable_x64", True)
    from ofot_tpu.utils.compile_cache import enable as enable_cache
    enable_cache()

    import jax.numpy as jnp
    from ofot_tpu.utils import image, flo, metrics, warp, colorwheel
    from ofot_tpu.utils.trace import JsonlLogger
    from ofot_tpu.solvers import foto, gn
    from ofot_tpu.utils.checkpoint import save_state, load_state

    logger = JsonlLogger(args.log_jsonl)
    solver_stats = {}

    np.random.seed(0)   # reference main.py:49 (no stochastic path used)

    f1, w, h = image.open_grayscale(args.f0)
    f2, w, h = image.open_grayscale(args.f1)

    print("***********************************")
    print("Input images: ")
    print(" - f0 = " + str(args.f0) + " / total mass = " + str(np.sum(f1)))
    print(" - f1 = " + str(args.f1) + " / total mass = " + str(np.sum(f2)))
    if args.normalize is True:
        print(" - normalize input images")
        rho1, rho2 = image.mass_normalize(f1, f2)
    else:
        rho1 = f1
        rho2 = f2

    dtype = jnp.float64 if args.precision == "f64" else jnp.float32
    rho1_d = jnp.asarray(rho1, dtype)
    rho2_d = jnp.asarray(rho2, dtype)

    if args.profile:
        jax.profiler.start_trace(args.profile)

    start_time = time.time()
    # set immediately after each branch's core solve completes, BEFORE any
    # optional diagnostics (W2 / wfr_distance / the b->b sinkhorn
    # self-solve): those are gated on --log-jsonl and must not inflate the
    # benchmark "time:" line the sweep manifest records (review, round 3)
    solve_end = None
    if args.algo == "foto":
        print(" - algorithm: FOTO")
        print(f"\t - Nt={args.Nt}")
        print(f"\t - r={args.r}")
        print(f"\t - convergence_tol={args.convergence_tol}")
        print(f"\t - reg_epsilon={args.reg_epsilon}")
        print(f"\t - max_it={args.max_it}")
        init = load_state(args.resume) if args.resume else None
        solver = foto.resolve_stepA_solver(
            args.stepA_solver, jax.devices()[0].platform,
            args.Nt * rho1_d.shape[0] * rho1_d.shape[1])
        ops = foto.stepA_ops(solver)
        result = foto.solve(
            rho1_d, rho2_d, args.Nt, r=args.r,
            convergence_tol=args.convergence_tol,
            reg_epsilon=args.reg_epsilon, max_it=args.max_it,
            verbose=not args.quiet, init=init, ops=ops,
            admm_alpha=args.admm_alpha, auto_r=args.auto_r)
        u, v, m = (np.asarray(result.u), np.asarray(result.v),
                   np.asarray(result.m))
        jax.block_until_ready(result.state.phi)
        solve_end = time.time()
        solver_stats = {"iterations": int(result.state.iteration),
                        "inner_iterations": int(result.state.cg_iterations),
                        "crit": float(result.state.crit),
                        "stepA_solver": solver}
        # the OT value the solve computes anyway (net-new vs reference):
        # W2 between the normalized densities, in pixel units.  Jitted
        # (eager dispatch is ~10 ops — minutes over the remote TPU tunnel)
        # and skipped under --quiet unless a JSONL log wants the number,
        # so benchmark runs pay nothing for it.
        if not args.quiet or args.log_jsonl:
            w2 = float(jax.jit(foto.wasserstein2)(result.state))
            solver_stats["wasserstein2"] = w2
            if not args.quiet:
                print(f"W2(rho0, rhoT) = {w2:.6g} px")
        if args.checkpoint:
            save_state(args.checkpoint, result.state)
        if args.save_density_frames:
            os.makedirs(args.save_density_frames, exist_ok=True)
            rho = np.asarray(result.state.mu[0])     # (Nt, Ny, Nx)
            for n in range(rho.shape[0]):
                image.save_grayscale(
                    w * h * rho[n],
                    os.path.join(args.save_density_frames, f"rho-{n}.png"))
    elif args.algo == "GN":
        print(" - algorithm: GN")
        print(f"\t - alpha={args.alpha}")
        print(f"\t - lambda={args.lambdaa}")
        if args.pyramid_levels > 1:
            # coarse-to-fine: GN linearizes the brightness constraint
            # around zero flow and silently fails past a few px of motion
            # (solvers/pyramid.py; VERDICT.md r4 item 6) — the pyramid
            # solves residual flows at halved scales.  m is solved at the
            # finest level around the final warp, same (u, v, m) contract.
            print(f"\t - pyramid_levels={args.pyramid_levels}")
            from ofot_tpu.solvers import pyramid
            u_d, v_d, m_d = pyramid.solve_gn_pyramid_jit(
                rho1_d, rho2_d, args.alpha, args.lambdaa,
                levels=args.pyramid_levels)
            jax.block_until_ready(u_d)
            u, v, m = np.asarray(u_d), np.asarray(v_d), np.asarray(m_d)
            solve_end = time.time()
            solver_stats = {"pyramid_levels": args.pyramid_levels}
        else:
            res = gn.solve_fields(rho1_d, rho2_d, args.alpha, args.lambdaa)
            jax.block_until_ready(res.u)
            u, v, m = np.asarray(res.u), np.asarray(res.v), np.asarray(res.m)
            solve_end = time.time()
            solver_stats = {"inner_iterations": int(res.cg.iterations),
                            "residual": float(res.cg.residual),
                            "converged": bool(res.cg.converged)}
    elif args.algo == "WFR":
        # framework extension: unbalanced dynamic OT (Wasserstein-Fisher-
        # Rao) — FOTO with a source term, so illumination change is
        # modeled instead of mass-normalized away
        print(" - algorithm: WFR (unbalanced optimal transport)")
        print(f"\t - Nt={args.Nt}")
        print(f"\t - r={args.r}")
        print(f"\t - delta={args.wfr_delta}")
        print(f"\t - convergence_tol={args.convergence_tol}")
        print(f"\t - reg_epsilon={args.reg_epsilon}")
        print(f"\t - max_it={args.max_it}")
        from ofot_tpu.solvers import wfr
        init = load_state(args.resume) if args.resume else None
        solver = wfr.resolve_stepA_solver(
            args.stepA_solver, jax.devices()[0].platform,
            args.Nt * rho1_d.shape[0] * rho1_d.shape[1])
        result = wfr.solve(
            rho1_d, rho2_d, args.Nt, delta=args.wfr_delta, r=args.r,
            convergence_tol=args.convergence_tol,
            reg_epsilon=args.reg_epsilon, max_it=args.max_it,
            verbose=not args.quiet, init=init, auto_r=args.auto_r,
            ops=foto.stepA_ops(solver), admm_alpha=args.admm_alpha)
        # the luminosity slot composes the GROWTH field (the brightness
        # change the source term modeled — VERDICT.md r3 item 3) with the
        # advective dilution correction -div(u, v): independent physical
        # effects, and the composition beats either alone on both the
        # clean and illumination-augmented benchmarks (wfr.
        # combined_luminosity docstring; RESULTS.md m-variant study)
        u, v, m = (np.asarray(result.u), np.asarray(result.v),
                   np.asarray(jax.jit(wfr.combined_luminosity)(
                       result.m, result.growth)))
        jax.block_until_ready(result.state.phi)
        solve_end = time.time()
        solver_stats = {"iterations": int(result.state.iteration),
                        "crit": float(result.state.crit),
                        "delta": args.wfr_delta,
                        "stepA_solver": solver}
        if not args.quiet or args.log_jsonl:
            dist, created = jax.jit(lambda s: (
                wfr.wfr_distance(s),
                wfr.total_created_mass(s, args.wfr_delta)))(result.state)
            solver_stats["wfr_distance"] = float(dist)
            solver_stats["created_mass"] = float(created)
            if not args.quiet:
                print(f"WFR(rho0, rhoT) = {float(dist):.6g} px, "
                      f"created mass = {float(created):.6g}")
        if args.checkpoint:
            save_state(args.checkpoint, result.state)
        if args.save_growth:
            image.save_grayscale(
                np.clip((np.asarray(result.growth) + 1) / 2, 0, 1
                        ).reshape(h, w), args.save_growth)
    elif args.algo == "sinkhorn":
        # framework extension: static entropic OT — one Sinkhorn solve +
        # barycentric flow extraction instead of a dynamic ALG2 iteration
        # (pure MXU matmuls; the reference has no static-OT path at all)
        print(" - algorithm: sinkhorn (static entropic OT)")
        print(f"\t - epsilon={args.sinkhorn_epsilon}")
        print(f"\t - tol={args.sinkhorn_tol}")
        print(f"\t - max_it={args.max_it}")
        from ofot_tpu.solvers import sinkhorn
        from ofot_tpu.ops import operators
        if (args.sinkhorn_epsilon < 3 and args.precision != "f64"
                and args.sinkhorn_stabilizer == "matmul"):
            # measured f32 envelope of the matmul softmin (solvers/
            # sinkhorn.py module docstring).  Only warn when the user
            # has PINNED matmul: with auto (default) the final-marginal
            # verification surfaces a below-envelope failure and the
            # exact re-solve handles it; with exact there is no envelope
            print(f"WARNING: --sinkhorn-epsilon={args.sinkhorn_epsilon} is "
                  "below the matmul softmin's f32 envelope (eps >= 3); "
                  "results may be degraded — drop the pinned "
                  "--sinkhorn-stabilizer=matmul, or use --precision=f64 "
                  "or a larger eps", file=sys.stderr)
        if not 0.0 < args.sinkhorn_theta < 2.0:
            # inside flow()'s jit theta is a tracer, so the library-level
            # ValueError cannot fire there — reject at the CLI boundary
            # (theta >= 2 diverges to NaN potentials, which would
            # otherwise come back as a plausible all-zero flow)
            raise SystemExit(f"--sinkhorn-theta={args.sinkhorn_theta} "
                             "outside the convergent range (0, 2)")
        stab = ("exact" if args.sinkhorn_stabilizer == "exact"
                else "matmul")
        res = sinkhorn.flow(
            rho1_d, rho2_d, args.sinkhorn_epsilon,
            max_iter=args.max_it, tol=args.sinkhorn_tol,
            theta=args.sinkhorn_theta, stabilizer=stab)
        jax.block_until_ready(res.u)
        if (args.sinkhorn_stabilizer == "auto" and
                not (res.marginal_error <= args.sinkhorn_tol)):
            # f32 matmul-softmin floor (solvers/sinkhorn.py
            # _exact_stats docstring): the -lum regime's potential
            # spread exceeds the dtype's exp window, the fast path
            # plateaus, and the exactly-shifted softmin converges ON
            # DEVICE at the same dtype — no f64/CPU escape needed
            # (VERDICT.md r4 item 3)
            print(f"  marginal error {float(res.marginal_error):.3g} > "
                  f"tol {args.sinkhorn_tol:g} on the matmul-softmin path "
                  "— re-solving with the exactly-stabilized softmin",
                  flush=True)
            me_matmul = float(res.marginal_error)
            stab = "exact"
            res = sinkhorn.flow(
                rho1_d, rho2_d, args.sinkhorn_epsilon,
                max_iter=args.max_it, tol=args.sinkhorn_tol,
                theta=args.sinkhorn_theta, stabilizer=stab)
            jax.block_until_ready(res.u)
        # luminosity from the displacement's divergence, same convention
        # as the dynamic extraction (reference benamou_brenier.py:270);
        # jitted — eager stencil dispatch costs ~10 tunnel round-trips
        # (review, round 4)
        m_d = jax.jit(lambda u, v: -operators.div2d(u, v, bc="D"))(
            res.u, res.v)
        u, v, m = np.asarray(res.u), np.asarray(res.v), np.asarray(m_d)
        solve_end = time.time()
        solver_stats = {"iterations": int(res.iterations),
                        "marginal_error": float(res.marginal_error),
                        "epsilon": args.sinkhorn_epsilon,
                        "stabilizer": stab}
        if stab == "exact" and args.sinkhorn_stabilizer == "auto":
            solver_stats["marginal_error_matmul"] = me_matmul
        if not (res.marginal_error <= args.sinkhorn_tol):
            # a max_iter exit returns a biased flow — surface it instead
            # of leaving it buried in solver_stats (ADVICE.md r2).  The
            # negated <= form also fires on a NaN error (diverged solve),
            # which a plain `> tol` comparison silently misses
            print(f"WARNING: sinkhorn hit max-it={args.max_it} with "
                  f"marginal error {float(res.marginal_error):.3g} > "
                  f"tol {args.sinkhorn_tol:g}; flow may be biased — "
                  "raise --max-it", file=sys.stderr)
        if not args.quiet or args.log_jsonl:
            # debiased W2 from the costs flow() already computed (a->b and
            # the a->a self-solve); only the b->b self-solve is new
            # (ADVICE.md r2 — was 5 solves where 3 suffice).  Same theta
            # as flow()'s solves, and its convergence is checked like
            # theirs (review, round 3)
            # annealed like flow()'s own solves, so all three costs in
            # the divergence are converged by the same schedule (review,
            # round 4; self-solves converge even plain, but uniformity
            # costs nothing — the ladder reuses solve()'s executable)
            bb = sinkhorn.solve_annealed(
                rho2_d, rho2_d, args.sinkhorn_epsilon,
                max_iter=args.max_it, tol=args.sinkhorn_tol,
                theta=args.sinkhorn_theta, stabilizer=stab)
            div = res.cost_ab - 0.5 * (res.cost_aa + bb.cost)
            w2 = float(jnp.sqrt(jnp.maximum(div, 0.0)))
            solver_stats["wasserstein2"] = w2
            solver_stats["w2_marginal_error"] = float(bb.marginal_error)
            if not (bb.marginal_error <= args.sinkhorn_tol):
                print("WARNING: the b->b self-solve behind W2_entropic "
                      f"exited at marginal error "
                      f"{float(bb.marginal_error):.3g} > tol "
                      f"{args.sinkhorn_tol:g}; the reported W2 may be "
                      "biased", file=sys.stderr)
            if not args.quiet:
                print(f"W2_entropic(rho0, rhoT) = {w2:.6g} px")
    elif args.algo == "HS":
        # framework extension: classic Horn-Schunck (no luminosity field)
        print(" - algorithm: HS")
        print(f"\t - alpha={args.alpha}")
        from ofot_tpu.solvers import hs
        if args.pyramid_levels > 1:
            print(f"\t - pyramid_levels={args.pyramid_levels}")
            from ofot_tpu.solvers import pyramid
            u_d, v_d = pyramid.solve_hs_pyramid_jit(
                rho1_d, rho2_d, args.alpha, levels=args.pyramid_levels)
            jax.block_until_ready(u_d)
            u, v = np.asarray(u_d), np.asarray(v_d)
            m = np.zeros_like(u)
            solve_end = time.time()
            solver_stats = {"pyramid_levels": args.pyramid_levels}
        else:
            res = hs.solve_fields(rho1_d, rho2_d, args.alpha)
            jax.block_until_ready(res.u)
            u, v = np.asarray(res.u), np.asarray(res.v)
            m = np.zeros_like(u)
            solver_stats = {"inner_iterations": int(res.cg.iterations),
                            "residual": float(res.cg.residual),
                            "converged": bool(res.cg.converged)}
    else:
        print(f"ERROR: unknown --algo '{args.algo}' "
              f"(expected foto, GN, HS, WFR, or sinkhorn)", file=sys.stderr)
        return 2
    timer = (solve_end if solve_end is not None else time.time()) \
        - start_time

    if args.profile:
        jax.profiler.stop_trace()

    # Benchmark (reference main.py:107-134)
    print("Benchmark:")
    rec = np.asarray(warp.apply_flow(
        jnp.asarray(f1, dtype), jnp.asarray(u, dtype), jnp.asarray(v, dtype),
        jnp.asarray(m, dtype)))
    rec = np.clip(rec, 0, 1)
    IE = metrics.IE(w, h, rec, f2)
    print(" - time: " + str(timer) + "s")
    print(" - IE: " + str(IE))
    logger.log("solve", algo=args.algo, f0=args.f0, f1=args.f1,
               w=w, h=h, wall_s=timer, IE=IE, **solver_stats)

    if args.ground_truth:
        wGT, hGT, uGT, vGT = flo.read_flo(args.ground_truth)
        assert wGT == w and hGT == h
        AEE, SDEE = metrics.EE(w, h, u.ravel(), v.ravel(), uGT, vGT)
        AAE, SDAE = metrics.AE(w, h, u.ravel(), v.ravel(), uGT, vGT)
        print(" - EE-mean: " + str(AEE))
        print(" - EE-stddev: " + str(SDEE))
        print(" - AE-mean: " + str(AAE))
        print(" - AE-stddev: " + str(SDAE))

    if args.save_benchmark:
        with open(args.save_benchmark, "w") as f:
            if args.ground_truth:
                f.write("EE-mean: " + str(AEE) + "\n")
                f.write("EE-stddev: " + str(SDEE) + "\n")
                f.write("AE-mean: " + str(AAE) + "\n")
                f.write("AE-stddev: " + str(SDAE) + "\n")
            f.write("IE: " + str(IE) + "\n")
            f.write("time: " + str(timer) + "s")

    if args.out:
        print("saving flo file...")
        flo.write_flo(w, h, u.ravel(), v.ravel(), args.out)

    if args.save_reconstruction:
        print("saving reconstruction...")
        image.save_grayscale(rec.reshape(h, w), args.save_reconstruction)

    if args.save_lum:
        print("saving luminosity...")
        image.save_grayscale(((m + 1) / 2).reshape(h, w), args.save_lum)

    if args.save_flow_viz:
        print("saving flow visualization...")
        from PIL import Image as PILImage
        rgb, _, _ = colorwheel.motion_to_color(u.reshape(h, w), v.reshape(h, w))
        PILImage.fromarray(rgb, "RGB").save(args.save_flow_viz)

    print("***********************************")
    return 0


if __name__ == "__main__":
    sys.exit(main())
