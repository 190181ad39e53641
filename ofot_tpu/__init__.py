"""ofot_tpu — TPU-native dense optical-flow engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
thomasjacumin/optical-flow-optimal-transport (reference mounted read-only at
/root/reference): the Gennert–Negahdaripour (GN) variational optical-flow
solver and the FOTO Benamou–Brenier dynamic-optimal-transport solver, plus
the full I/O, metrics, visualization and benchmark pipeline around them.

Design principles (see SURVEY.md §7):
  * every operator the reference materializes as a scipy.sparse CSR matrix
    (reference operators.py) is a matrix-free stencil on (Nt, Ny, Nx) arrays;
  * every solver loop (CG, ALG2) is a jitted `lax.while_loop`;
  * hot pointwise kernels (paraboloid projection, fused stencils) have
    Pallas TPU implementations;
  * distribution is `jax.sharding.Mesh` + GSPMD/`shard_map` with
    `lax.ppermute` halo exchange and `lax.psum` reductions — never NCCL/MPI.
"""

__version__ = "0.1.0"

from ofot_tpu import ops, solvers, utils, parallel  # noqa: F401
from ofot_tpu.solvers.foto import solve as solve_foto  # noqa: F401
from ofot_tpu.solvers.gn import solve_fields as solve_gn  # noqa: F401
