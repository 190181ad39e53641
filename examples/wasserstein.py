"""Wasserstein-2 distances three ways (framework extension; the reference
solver computes the underlying objects but never exposes a distance):

  1. dynamic  — FOTO/Benamou-Brenier kinetic action -> foto.wasserstein2
  2. entropic — debiased Sinkhorn divergence -> sinkhorn.wasserstein2_entropic
  3. exact    — the known closed form for a pure translation (= the shift)

Run: python examples/wasserstein.py [--platform cpu]
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

    from ofot_tpu.solvers import foto, sinkhorn

    # unit-mass Gaussian blob translated by 4 px: W2 == 4 exactly
    ny = nx = 48
    shift = 4.0
    y, x = np.mgrid[0:ny, 0:nx].astype(np.float32)

    def blob(cy, cx):
        return np.exp(-(((y - cy) / 6.0) ** 2 + ((x - cx) / 6.0) ** 2))

    a = blob(24, 22)
    b = blob(24, 22 + shift)
    a, b = a / a.sum(), b / b.sum()

    print("== dynamic W2 (Benamou-Brenier ALG2) ==")
    s = max(a.max(), b.max())
    st, _ = foto.solve_potential_with_history(
        jnp.asarray(a / s), jnp.asarray(b / s), 8, 300,
        r=0.1, reg_epsilon=1e-3, ops=foto.DCT_OPS)
    w2_dyn = float(foto.wasserstein2(st))
    print(f"  W2 = {w2_dyn:.4f} px   (kinetic action over the "
          f"transport path)")

    print("== entropic W2 (debiased Sinkhorn, static OT) ==")
    res = sinkhorn.wasserstein2_entropic(
        jnp.asarray(a), jnp.asarray(b), epsilon=2.0, max_iter=2000,
        full=True)
    print(f"  W2 = {float(res.value):.4f} px   "
          f"(marginal_error={float(res.marginal_error):.2e}, "
          f"{int(res.iterations)} iterations)")

    print(f"== ground truth ==\n  W2 = {shift:.4f} px (pure translation)")
    for name, v in (("dynamic", w2_dyn), ("entropic", float(res.value))):
        err = abs(v - shift) / shift
        print(f"  {name}: relative error {err:.2%}")


if __name__ == "__main__":
    main()
