"""W2 gradient-flow demo: morph a density toward a target by descending
the differentiable Sinkhorn divergence (solvers/otgrad.py; VERDICT.md r4
item 7).

Mirror descent keeps the density positive and mass-conserving:
    a <- a * exp(-eta * dS/da),  renormalized to the original mass.
Each step costs three annealed Sinkhorn solves forward and NOTHING
backward (envelope gradients from the converged dual potentials).

Run:  python tools/w2_gradient_flow.py [--steps 12] [--out-dir DIR]
Prints the divergence trajectory (strictly decreasing) and, with
--out-dir, saves the density frames as PNGs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--eta", type=float, default=0.6,
                   help="mirror-descent step, applied to the gradient "
                        "normalized by its max magnitude (keeps the "
                        "multiplicative update in a stable range)")
    p.add_argument("--epsilon", type=float, default=4.0)
    p.add_argument("--out-dir")
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from ofot_tpu.solvers import otgrad

    n = args.size
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    blob = lambda cy, cx, s: np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / s) \
        + 1e-4
    a = jnp.asarray(blob(n * 0.3, n * 0.3, 24), jnp.float32)
    # target: two modes — the flow must split mass, not just translate
    b = jnp.asarray(blob(n * 0.7, n * 0.6, 18)
                    + 0.6 * blob(n * 0.35, n * 0.75, 14), jnp.float32)
    mass = float(jnp.sum(a))
    kw = (("max_iter", 800), ("tol", 1e-6))

    step = jax.jit(lambda a: jax.value_and_grad(
        otgrad.sinkhorn_divergence_dual)(a, b, args.epsilon, kw))

    traj = []
    frames = [np.asarray(a)]
    for t in range(args.steps):
        val, g = step(a)
        traj.append(float(val))
        g = g / jnp.max(jnp.abs(g))         # scale-free descent direction
        a = a * jnp.exp(-args.eta * g)
        a = a * mass / jnp.sum(a)
        frames.append(np.asarray(a))
        print(f"step {t:2d}: S = {float(val):.5f}", flush=True)
    final = float(otgrad.sinkhorn_divergence_dual(a, b, args.epsilon, kw))
    traj.append(final)
    print(f"final:   S = {final:.5f} "
          f"({traj[0] / max(final, 1e-12):.0f}x reduction)")

    if args.out_dir:
        from ofot_tpu.utils import image
        os.makedirs(args.out_dir, exist_ok=True)
        for i, f in enumerate(frames):
            image.save_grayscale(f / f.max(),
                                 os.path.join(args.out_dir, f"a_{i:02d}.png"))
        image.save_grayscale(np.asarray(b) / np.asarray(b).max(),
                             os.path.join(args.out_dir, "target.png"))
    print(json.dumps({"tool": "w2_gradient_flow", "steps": args.steps,
                      "S_trajectory": [round(v, 5) for v in traj]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
