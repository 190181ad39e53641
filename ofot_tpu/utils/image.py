"""Grayscale image I/O and normalization helpers.

Host-side (PIL/numpy) pieces of the pipeline; the device boundary of the
framework sits here (SURVEY.md §3.1 note).
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

# native libpng decoder (ofot_tpu/native/ofot_io.cpp): bit-identical to
# PIL's convert('L') incl. the ITU-R 601-2 fixed-point luma, faster, and
# keeps the sweep's input pipeline off the Python interpreter.  Falls back
# to PIL when the extension isn't built (make -C ofot_tpu/native).
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
try:
    sys.path.insert(0, os.path.abspath(_NATIVE_DIR))
    import _ofot_io as _native_io
except ImportError:                                  # pragma: no cover
    _native_io = None
finally:
    sys.path.remove(os.path.abspath(_NATIVE_DIR))


def open_grayscale(pathname: str):
    """Open an image as normalized grayscale -> (field (h, w) float64 in
    [0, 1], w, h).  Matches reference ``openGrayscaleImage``
    (reference utils.py:25-42) except the field is returned 2-D; use
    ``.ravel()`` for the reference's flat layout."""
    if _native_io is not None and pathname.lower().endswith(".png"):
        w, h, data = _native_io.read_grayscale_png(pathname)
        f = np.frombuffer(data, np.uint8).reshape(h, w)
    else:
        f = np.asarray(Image.open(pathname).convert("L"))
        h, w = f.shape
    return f.astype(np.float64) / 255.0, w, h


def save_grayscale(field, pathname: str) -> None:
    """Save a [0, 1] field (h, w) as an 8-bit grayscale PNG, with the
    reference's clip-then-quantize convention (reference main.py:142)."""
    arr = np.uint8(255 * np.clip(np.asarray(field), 0.0, 1.0))
    if _native_io is not None and pathname.lower().endswith(".png"):
        h, w = arr.shape
        _native_io.write_grayscale_png(pathname, w, h,
                                       np.ascontiguousarray(arr).tobytes())
    else:
        Image.fromarray(arr, "L").save(pathname)


def mass_normalize(f1, f2):
    """Divide each frame by its own total mass — the CLI ``--normalize``
    behavior (reference main.py:71-77)."""
    return f1 / np.sum(f1), f2 / np.sum(f2)


def mass_normalize_pair_common_max(f1, f2):
    """Per-frame mass normalization then common-max rescale — the dataset
    preparation tool's behavior (reference bin/normalize_image.py:20-26)."""
    f1 = f1 / np.sum(f1)
    f2 = f2 / np.sum(f2)
    scale = max(np.max(f1), np.max(f2))
    return f1 / scale, f2 / scale
