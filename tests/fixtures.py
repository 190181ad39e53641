"""Shared synthetic fixtures.

The translating-square pair is the reference author's own smoke fixture
(commented out in reference main.py:55-65): a bright square occupying
[h/6, 3h/6)^2 in frame 1, shifted to [2h/6, 4h/6)^2 in frame 2 — a
mass-preserving pure translation by h/6 pixels in both axes.
"""

import numpy as np


def translating_square(n=32, dtype=np.float64):
    f1 = np.zeros((n, n), dtype)
    f2 = np.zeros((n, n), dtype)
    f1[n // 6: 3 * n // 6, n // 6: 3 * n // 6] = 1.0
    f2[2 * n // 6: 4 * n // 6, 2 * n // 6: 4 * n // 6] = 1.0
    return f1, f2


def smooth_blob_pair(ny=24, nx=28, shift=(2.0, 1.0), dtype=np.float64):
    """Smooth Gaussian blob translated by ``shift`` (dy, dx) — a softer
    fixture on which variational solvers behave well."""
    y, x = np.mgrid[0:ny, 0:nx].astype(dtype)
    cy, cx = ny / 2 - 2, nx / 2 - 2

    def blob(cy_, cx_):
        return np.exp(-(((y - cy_) / 4.0) ** 2 + ((x - cx_) / 4.0) ** 2))

    return blob(cy, cx), blob(cy + shift[0], cx + shift[1])
