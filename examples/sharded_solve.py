"""Spatially tiled FOTO solve on a (y, x) device mesh.

Run on CPU with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/sharded_solve.py --platform cpu
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

    from ofot_tpu.parallel import mesh as meshlib, foto_sharded

    n_dev = len(jax.devices())
    py = 2 if n_dev >= 2 else 1
    px = 2 if n_dev >= 4 else 1
    mesh = meshlib.spatial_mesh(py, px)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} devices")

    n = 64
    f1 = np.zeros((n, n), np.float32); f1[10:30, 10:30] = 1.0
    f2 = np.zeros((n, n), np.float32); f2[16:36, 16:36] = 1.0

    st = foto_sharded.solve_potential_tiled(
        jnp.asarray(f1), jnp.asarray(f2), 8, mesh,
        r=1.0, convergence_tol=0.05, reg_epsilon=1e-2, max_it=40)
    print(f"iterations={int(st.iteration)} crit={float(st.crit):.4f} "
          f"phi shape={st.phi.shape}")


if __name__ == "__main__":
    main()
