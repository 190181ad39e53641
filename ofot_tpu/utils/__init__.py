"""Runtime utilities: I/O, warping, metrics, visualization, checkpointing."""

from ofot_tpu.utils import (  # noqa: F401
    flo, image, metrics, warp, colorwheel, checkpoint)
