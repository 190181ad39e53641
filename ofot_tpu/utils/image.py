"""Grayscale image I/O and normalization helpers.

Host-side (PIL/numpy) pieces of the pipeline; the device boundary of the
framework sits here (SURVEY.md §3.1 note).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def open_grayscale(pathname: str):
    """Open an image as normalized grayscale -> (field (h, w) float64 in
    [0, 1], w, h).  Matches reference ``openGrayscaleImage``
    (reference utils.py:25-42) except the field is returned 2-D; use
    ``.ravel()`` for the reference's flat layout."""
    f = np.asarray(Image.open(pathname).convert("L"))
    h, w = f.shape
    return f.astype(np.float64) / 255.0, w, h


def save_grayscale(field, pathname: str) -> None:
    """Save a [0, 1] field (h, w) as an 8-bit grayscale PNG, with the
    reference's clip-then-quantize convention (reference main.py:142)."""
    arr = np.asarray(field)
    Image.fromarray(np.uint8(255 * np.clip(arr, 0.0, 1.0)), "L").save(pathname)


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
