"""Unbalanced OT (WFR) vs balanced FOTO on a brightness-changing scene.

The round-4 headline capability: a moving blob that also BRIGHTENS 40%.
Balanced OT must explain the brightening as mass transported from
elsewhere; WFR routes it to the source/growth channel and reconstructs
with the composed luminosity ``1+m = (1+g)(1+m_div)``.

Run: python examples/unbalanced_flow.py [--platform cpu]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from ofot_tpu.solvers import foto, wfr
    from ofot_tpu.utils import metrics, warp

    ny, nx, shift, gain = 48, 64, 3.0, 1.4
    y, x = np.mgrid[0:ny, 0:nx].astype(np.float32)

    def blob(cy, cx):
        return np.exp(-(((y - cy) / 6.0) ** 2 + ((x - cx) / 6.0) ** 2))

    f1 = 0.5 * blob(ny / 2, nx / 2 - shift / 2)
    f2 = 0.5 * gain * blob(ny / 2, nx / 2 + shift / 2)   # moved AND brighter
    a, b = jnp.asarray(f1), jnp.asarray(f2)

    def report(name, u, v, m):
        rec = np.clip(np.asarray(warp.apply_flow(a, u, v, m)), 0, 1)
        ie = metrics.IE(nx, ny, rec, f2)
        print(f"  {name:<28} IE = {ie:6.3f}   mean|u| = "
              f"{float(jnp.abs(u).mean()):.3f}")
        return ie

    print(f"== blob shifted {shift} px and brightened x{gain} ==")
    fr = foto.solve(a, b, 8, r=1.0, reg_epsilon=1e-2, convergence_tol=0.01,
                    max_it=150, ops=foto.DCT_OPS, admm_alpha=1.7,
                    auto_r=True)
    report("FOTO (balanced)", fr.u, fr.v, fr.m)

    wr = wfr.solve(a, b, 8, delta=5.0, r=1.0, reg_epsilon=1e-2,
                   convergence_tol=0.01, max_it=150, admm_alpha=1.7,
                   auto_r=True)
    m_combined = jax.jit(wfr.combined_luminosity)(wr.m, wr.growth)
    report("WFR (growth + dilution m)", wr.u, wr.v, m_combined)
    created = float(jax.jit(wfr.total_created_mass,
                            static_argnums=1)(wr.state, 5.0))
    print(f"  WFR created mass = {created:.4f} "
          f"(true mass gain = {float(f2.sum() - f1.sum()):.4f}); "
          f"peak growth = {float(jnp.max(wr.growth)):.2f} "
          f"(true brightening - 1 = {gain - 1:.2f})")


if __name__ == "__main__":
    main()
