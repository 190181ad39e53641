"""Solvers: matrix-free CG core, GN variational flow, FOTO ALG2 transport."""

from ofot_tpu.solvers import cg, gn, foto, flow_extract  # noqa: F401
