"""Gradient-tune GN's (alpha, lambda) against ground-truth EPE.

VERDICT.md r3 item 9: demonstrate the differentiable layer end-to-end — a
capability the reference cannot express at all (its parameters are
hand-set in run.sh:103).  The GN solve is differentiated IMPLICITLY
(solvers/implicit.py: one extra CG solve for the adjoint instead of
backprop through hundreds of iterations), so the whole middlebury-2
ground-truth set tunes in minutes on CPU.

    python tools/tune_gn.py [--steps 40] [--data-root data]

Prints the default-parameter EE (alpha=0.1, lambda=0.2 — the reference's
canonical values) vs the tuned EE, both computed with the benchmark's own
EE metric (outlier-dropping, utils/metrics.py) for comparability.
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
    p.add_argument("--data-root", default="data")
    p.add_argument("--dataset", default="middlebury-2")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--lr", type=float, default=0.15)
    p.add_argument("--platform", default="cpu",
                   help="cpu (f64, default) — the implicit adjoint's "
                        "rtol=1e-8 CG wants f64")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import optax

    from ofot_tpu.solvers.implicit import gn_solve_implicit
    from ofot_tpu.utils import flo, image, metrics

    root = os.path.join(args.data_root, args.dataset)
    seq_root = os.path.join(root, "other-data-gray")
    # group by resolution: real Middlebury mixes sequence sizes, and a
    # flat np.stack would crash on the first mismatch (review, round 4) —
    # same strategy as the batched sweep's group_by_shape
    by_shape: dict = {}
    names = []
    for name in sorted(os.listdir(seq_root)):
        gt = os.path.join(root, "other-gt-flow", name, "flow10.flo")
        if not os.path.isfile(gt):
            continue
        f1, w, h = image.open_grayscale(
            os.path.join(seq_root, name, "frame10.png"))
        f2, _, _ = image.open_grayscale(
            os.path.join(seq_root, name, "frame11.png"))
        _, _, uGT, vGT = flo.read_flo(gt)
        names.append(name)
        by_shape.setdefault((h, w), []).append(
            (name, f1.reshape(h, w), f2.reshape(h, w),
             np.stack([uGT.reshape(h, w), vGT.reshape(h, w)])))
    if not names:
        print("no ground-truth sequences found", file=sys.stderr)
        return 1
    groups = []
    for (h, w), items in sorted(by_shape.items()):
        gts = jnp.asarray(np.stack([g for _, _, _, g in items]))
        groups.append(dict(
            names=[n for n, _, _, _ in items], h=h, w=w,
            f1s=jnp.asarray(np.stack([a for _, a, _, _ in items])),
            f2s=jnp.asarray(np.stack([b for _, _, b, _ in items])),
            gts=gts,
            # unknown-flow pixels (sentinel >= 1e9) excluded from the loss
            valid=jnp.all(jnp.abs(gts) < 1e9, axis=1)))
    print(f"{len(names)} sequences in {len(groups)} shape group(s): "
          f"{', '.join(names)}", file=sys.stderr)

    solve = jax.vmap(lambda a, b, al, lm: gn_solve_implicit(
        a, b, al, lm, rtol=1e-8, maxiter=4000), in_axes=(0, 0, None, None))

    def smooth_epe(theta):
        """Differentiable surrogate of the EE benchmark metric: mean
        sqrt(|flow - gt|^2 + eps) over valid pixels across all shape
        groups (the benchmark's outlier drop is non-differentiable;
        outliers this size do not occur on these pairs)."""
        log_alpha, log_lambda = theta
        tot = cnt = 0.0
        for g in groups:
            x = solve(g["f1s"], g["f2s"],
                      jnp.exp(log_alpha), jnp.exp(log_lambda))
            d2 = ((x[:, 0] - g["gts"][:, 0]) ** 2
                  + (x[:, 1] - g["gts"][:, 1]) ** 2)
            epe = jnp.sqrt(d2 + 1e-12)
            tot = tot + jnp.sum(jnp.where(g["valid"], epe, 0.0))
            cnt = cnt + jnp.sum(g["valid"])
        return tot / cnt

    loss_grad = jax.jit(jax.value_and_grad(smooth_epe))

    def benchmark_ee(alpha, lambda_):
        """The real (outlier-dropping) EE metric, per sequence + mean,
        in the global `names` order."""
        ees = {}
        for g in groups:
            x = np.asarray(solve(g["f1s"], g["f2s"], jnp.asarray(alpha),
                                 jnp.asarray(lambda_)))
            for i, n in enumerate(g["names"]):
                ee, _ = metrics.EE(g["w"], g["h"], x[i, 0].ravel(),
                                   x[i, 1].ravel(),
                                   np.asarray(g["gts"][i, 0]).ravel(),
                                   np.asarray(g["gts"][i, 1]).ravel())
                ees[n] = ee
        return [ees[n] for n in names]

    theta = jnp.asarray([np.log(0.1), np.log(0.2)])   # reference defaults
    opt = optax.adam(args.lr)
    state = opt.init(theta)
    t0 = time.time()
    for step in range(args.steps):
        loss, g = loss_grad(theta)
        updates, state = opt.update(g, state)
        theta = optax.apply_updates(theta, updates)
        if step % 5 == 0 or step == args.steps - 1:
            a, l = np.exp(np.asarray(theta))
            print(f"step {step:3d}  epe {float(loss):.5f}  "
                  f"alpha {a:.5f}  lambda {l:.5f}  "
                  f"|g| {float(jnp.abs(g).max()):.3g}", file=sys.stderr)
    a_t, l_t = [float(v) for v in np.exp(np.asarray(theta))]
    print(f"tuned in {time.time() - t0:.1f}s", file=sys.stderr)

    ee_def = benchmark_ee(0.1, 0.2)
    ee_tun = benchmark_ee(a_t, l_t)
    print(f"{'sequence':<12} {'EE default(0.1,0.2)':>20} "
          f"{'EE tuned({:.4f},{:.4f})'.format(a_t, l_t):>24}")
    for n, d, t in zip(names, ee_def, ee_tun):
        print(f"{n:<12} {d:>20.4f} {t:>24.4f}")
    print(f"{'MEAN':<12} {np.mean(ee_def):>20.4f} "
          f"{np.mean(ee_tun):>24.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
