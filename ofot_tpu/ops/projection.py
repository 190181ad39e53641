"""Pointwise projection onto the Benamou–Brenier paraboloid.

Branch-free TPU-native equivalent of the reference's ``stepB``
(reference benamou_brenier.py:93-149), which projects each point
``p = (alpha, beta1, beta2)`` onto

    K = { (a, b) in R x R^2 : a + |b|^2 / 2 <= 0 }.

The reference iterates a pure-Python loop over all ``3*Nt*Nx*Ny`` points and
branches per point between a Cardano (single real root) and a trigonometric
(triple real root) solution of the projection cubic — ~80% of its total
runtime (SURVEY.md §6).  Here every lane computes both root branches with
domain-clamped inputs and selects with ``jnp.where``: pure VPU work, fused by
XLA, no data-dependent control flow.

Derivation notes (mirroring the reference's formulas exactly):
  * membership test: ``2*alpha + beta1^2 + beta2^2 <= 0``
    (benamou_brenier.py:123);
  * the Cardano inner radicand ``4/3 a^3 + 4 a^2 + 9/2 r^2 + 4 a + 4/3``
    equals ``(4/3)(a+1)^3 + (9/2) r^2``, so the single-root condition
    ``-32 (a+1)^3 - 108 r^2 < 0`` is exactly "radicand > 0" — the sqrt is
    safe on its own branch (benamou_brenier.py:131-136);
  * on the trig branch the arccos argument is guaranteed in [0, 1] by the
    discriminant; we clamp for fp safety (benamou_brenier.py:137-141).
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT2 = 1.4142135623730951
_TRIG_COEF = 2.0 * (2.0 / 3.0) ** 0.5      # 2*sqrt(2/3)
_ACOS_COEF = (3.0 / 2.0) ** 1.5            # (3/2)^(3/2)


def _project_core(alpha, rho2, eps):
    """Shared cylindrical-coordinate core: project ``(alpha, rho)`` with
    ``rho = sqrt(rho2) >= 0`` onto ``a + rho^2 / 2 <= 0``.

    Returns ``(inside, alpha_h, rho_h)``: the membership mask and the
    projected coordinates (only valid where ``~inside``).  The beta
    direction is untouched by the projection, so any number of beta
    components reduces to this 2-D problem — the basis of
    :func:`project_paraboloid_nd`."""
    rho = jnp.sqrt(rho2)
    inside = 2.0 * alpha + rho2 <= 0.0

    ap1 = alpha + 1.0
    radicand = (4.0 / 3.0) * ap1 * ap1 * ap1 + 4.5 * rho2
    single = radicand > 0.0          # == -32*(a+1)^3 - 108*rho^2 < 0

    # --- Cardano branch (single real root) ---
    s = 0.25 * _SQRT2 * rho + (1.0 / 6.0) * jnp.sqrt(jnp.maximum(radicand, 0.0))
    c = jnp.cbrt(s)                  # s >= 0 on its branch
    c_safe = jnp.where(c > 0, c, 1.0)
    zh_card = -(1.0 / 3.0) * ap1 / c_safe + c

    # --- trigonometric branch (triple real root), needs alpha < -1 ---
    nam = jnp.maximum(-ap1, eps)     # -(alpha + 1) > 0 on its branch
    acos_arg = jnp.clip(_ACOS_COEF * rho / (nam * jnp.sqrt(nam)), 0.0, 1.0)
    zh_trig = _TRIG_COEF * jnp.sqrt(nam) * jnp.cos(jnp.arccos(acos_arg) / 3.0)

    zh = jnp.where(single, zh_card, zh_trig)
    alpha_h = jnp.where(single, -zh * zh, -0.5 * zh * zh)
    rho_h = jnp.where(single, _SQRT2 * zh, zh)
    return inside, alpha_h, rho_h


def _proj_eps(dtype):
    return jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-20, dtype)


def project_paraboloid(p: jnp.ndarray) -> jnp.ndarray:
    """Project ``p`` (component axis 0: alpha, beta1, beta2) onto K.

    Accepts any shape ``(3, ...)``; returns the same shape.  Matches the
    reference ``stepB`` (benamou_brenier.py:93-149) pointwise to fp accuracy.
    """
    alpha, beta1, beta2 = p[0], p[1], p[2]
    eps = _proj_eps(p.dtype)

    rho2 = beta1 * beta1 + beta2 * beta2
    rho = jnp.sqrt(rho2)
    # cos/sin of atan2(beta2, beta1); atan2(0, 0) = 0 -> (cos, sin) = (1, 0)
    safe_rho = jnp.maximum(rho, eps)
    cos_t = jnp.where(rho > 0, beta1 / safe_rho, 1.0)
    sin_t = jnp.where(rho > 0, beta2 / safe_rho, 0.0)

    inside, alpha_h, rho_h = _project_core(alpha, rho2, eps)

    a_out = jnp.where(inside, alpha, alpha_h)
    b1_out = jnp.where(inside, beta1, rho_h * cos_t)
    b2_out = jnp.where(inside, beta2, rho_h * sin_t)
    return jnp.stack([a_out, b1_out, b2_out])


def project_paraboloid_nd(p: jnp.ndarray) -> jnp.ndarray:
    """Project ``p`` (component axis 0: alpha, beta_1 .. beta_k) onto
    ``K = { (a, b) in R x R^k : a + |b|^2 / 2 <= 0 }`` for any k >= 1.

    The projection acts only on (alpha, |beta|) — the beta direction is
    preserved — so the same cubic-root core applies with the betas
    rescaled by ``rho_h / rho``.  k = 2 is the Benamou–Brenier stepB
    (:func:`project_paraboloid`); k = 3 is the Wasserstein–Fisher–Rao /
    unbalanced-OT stepB (``ofot_tpu.solvers.wfr``), where the extra
    component is the source-rate dual ``-phi / delta``.
    """
    alpha, betas = p[0], p[1:]
    eps = _proj_eps(p.dtype)
    rho2 = jnp.sum(betas * betas, axis=0)
    inside, alpha_h, rho_h = _project_core(alpha, rho2, eps)
    # rho == 0 outside K implies the Cardano apex case with rho_h == 0,
    # so the 0/eps scale is exact there
    scale = jnp.where(inside, 1.0,
                      rho_h / jnp.maximum(jnp.sqrt(rho2), eps))
    a_out = jnp.where(inside, alpha, alpha_h)
    return jnp.concatenate([a_out[None], betas * scale[None]])
