"""Operator library: matrix-free stencils + pointwise projection kernels."""

from ofot_tpu.ops import stencils, operators, projection  # noqa: F401
