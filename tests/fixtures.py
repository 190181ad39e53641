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


_W2_CACHE = {}


def translated_blob_w2():
    """One shared ALG2 solve of a unit-mass Gaussian blob translated by 4
    px on a 48x48 grid — W2 ground truth = 4.0.  Used by BOTH
    test_foto.test_wasserstein2_of_translation and
    test_sinkhorn.test_matches_dynamic_w2; solved once per session
    (ADVICE.md r1: two independent 48x48 x 1000-iteration scans were the
    suite's slowest items).  300 iterations at r=0.1 give W2 within 0.7%
    of the shift (5% budget); r=1 stalls on the stagnation guard here.

    Returns (a, b, shift, state): normalized densities, the true shift,
    and the solved FotoState."""
    if "state" not in _W2_CACHE:
        import jax.numpy as jnp
        from ofot_tpu.solvers import foto

        ny = nx = 48
        y, x = np.mgrid[0:ny, 0:nx].astype(np.float32)

        def blob(cy, cx):
            return np.exp(-(((y - cy) / 6.0) ** 2 + ((x - cx) / 6.0) ** 2))

        shift = 4.0
        a, b = blob(24, 22), blob(24, 22 + shift)
        a, b = a / a.sum(), b / b.sum()
        s = max(a.max(), b.max())
        st, _ = foto.solve_potential_with_history(
            jnp.asarray(a / s), jnp.asarray(b / s), 8, 300,
            r=0.1, reg_epsilon=1e-3, ops=foto.DCT_OPS)
        _W2_CACHE["state"] = (a, b, shift, st)
    return _W2_CACHE["state"]


def smooth_blob_pair(ny=24, nx=28, shift=(2.0, 1.0), dtype=np.float64):
    """Smooth Gaussian blob translated by ``shift`` (dy, dx) — a softer
    fixture on which variational solvers behave well."""
    y, x = np.mgrid[0:ny, 0:nx].astype(dtype)
    cy, cx = ny / 2 - 2, nx / 2 - 2

    def blob(cy_, cx_):
        return np.exp(-(((y - cy_) / 4.0) ** 2 + ((x - cx_) / 4.0) ** 2))

    return blob(cy, cx), blob(cy + shift[0], cx + shift[1])
