"""Solvers: matrix-free CG core, GN/HS variational flow, FOTO ALG2
transport, WFR unbalanced transport, entropic (Sinkhorn) OT, spectral
(DCT) solves, pyramid coarse-to-fine, implicit diff, differentiable OT
values (otgrad)."""

from ofot_tpu.solvers import (  # noqa: F401
    cg, gn, hs, foto, flow_extract, dct, pyramid, implicit, sinkhorn,
    wfr, otgrad)
