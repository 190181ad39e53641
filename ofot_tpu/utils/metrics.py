"""Flow evaluation metrics: endpoint error, angular error, interpolation error.

Vectorized equivalents of the reference metrics (reference utils.py:294-354)
including their filtering quirks (SURVEY.md §2 quirk 7):

  * EE silently drops outlier pixels with endpoint error > 50
    (reference utils.py:310-312);
  * AE uses the Middlebury 1.0-augmented cosine formula and drops NaN
    pixels (arccos argument out of [-1, 1], reference utils.py:331-335);
  * both return population (not sample) standard deviations;
  * IE is the RMS image difference scaled by 255 (reference utils.py:354).
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_mean_std(values, mask):
    cnt = jnp.sum(mask)
    mean = jnp.sum(jnp.where(mask, values, 0.0)) / cnt
    var = jnp.sum(jnp.where(mask, (values - mean) ** 2, 0.0)) / cnt
    return mean, jnp.sqrt(var)


def endpoint_error(u, v, u_gt, v_gt, outlier_threshold: float = 50.0):
    """(mean, stddev) endpoint error, ignoring pixels with EE > 50."""
    ee = jnp.sqrt((u - u_gt) ** 2 + (v - v_gt) ** 2)
    return _masked_mean_std(ee, ee <= outlier_threshold)


def angular_error(u, v, u_gt, v_gt):
    """(mean, stddev) angular error in radians, NaN pixels dropped."""
    cosang = (1.0 + u * u_gt + v * v_gt) / (
        jnp.sqrt(1.0 + u * u + v * v) * jnp.sqrt(1.0 + u_gt * u_gt + v_gt * v_gt))
    ae = jnp.arccos(cosang)          # NaN when |cosang| > 1, like the reference
    mask = ~jnp.isnan(ae)
    return _masked_mean_std(jnp.where(mask, ae, 0.0), mask)


def interpolation_error(image, image_gt):
    """RMS image error on the 255 scale (scalar)."""
    diff = 255.0 * (jnp.asarray(image) - jnp.asarray(image_gt))
    return jnp.sqrt(jnp.sum(diff * diff) / diff.size)


# reference-style aliases operating on flat arrays
def EE(w, h, u, v, u_gt, v_gt):
    m, s = endpoint_error(jnp.asarray(u), jnp.asarray(v),
                          jnp.asarray(u_gt), jnp.asarray(v_gt))
    return float(m), float(s)


def AE(w, h, u, v, u_gt, v_gt):
    m, s = angular_error(jnp.asarray(u), jnp.asarray(v),
                         jnp.asarray(u_gt), jnp.asarray(v_gt))
    return float(m), float(s)


def IE(w, h, image, image_gt):
    return float(interpolation_error(image, image_gt))
