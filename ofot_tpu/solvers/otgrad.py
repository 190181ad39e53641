"""Differentiable OT values — envelope-theorem gradients w.r.t. densities.

Extends the implicit-diff story (solvers/implicit.py differentiates the
variational solvers w.r.t. their *scalar* parameters) to the OT family:
gradients of entropic OT values w.r.t. the INPUT DENSITIES, at the cost
of zero extra solves (VERDICT.md r4 item 7).

Theory (Danskin/envelope): the entropic value is the maximum of the dual
objective ``D(f, g; a, b) = <f, a> + <g, b> - eps <e^{f/eps}, K e^{g/eps}>
+ eps`` over the potentials, and at a converged plan the penalty term
vanishes (unit plan mass), so

    OT_eps(a, b) = <f, a> + <g, b>      and      d OT_eps / d a = f

with (f, g) the converged duals held FIXED — no differentiation through
the Sinkhorn iteration (``lax.while_loop`` is not reverse-differentiable
anyway, and unrolling hundreds of iterations would be absurd on TPU).
The densities are normalized internally (â = a / Σa), whose chain rule
gives ``(∇_a OT)_i = (f_i - <f, â>) / Σa``.

The debiased Sinkhorn divergence ``S = OT(a,b) - ½ OT(a,a) - ½ OT(b,b)``
then has ``∇_a S = [f_ab - p_aa - <f_ab - p_aa, â>] / Σa`` where ``p_aa``
is the (symmetric) self-solve potential — the Feydy et al. gradient.

All of it is wired through ``jax.custom_vjp``, so ``jax.grad`` /
``jax.value_and_grad`` on :func:`sinkhorn_divergence_dual` (or anything
composed on top, e.g. ``sqrt``) just works; validated against central
finite differences in tests/test_otgrad.py, and demonstrated as a W2
gradient flow in tools/w2_gradient_flow.py.

The reference has no OT-value API at all (its solver returns only the
flow, reference benamou_brenier.py:269-271) — this whole surface is
net-new.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ofot_tpu.solvers import sinkhorn


def _dual_value(res, a_hat, b_hat):
    """<f, a> + <g, b> of a converged solve (the regularized OT value)."""
    return jnp.sum(res.f * a_hat) + jnp.sum(res.g * b_hat)


def _norm(a):
    s = jnp.sum(a)
    return a / s, s


def _centered(grad_field, a_hat, total):
    """Normalization chain rule: d(â)/d(a) projects out the mean."""
    return (grad_field - jnp.sum(grad_field * a_hat)) / total


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def entropic_ot_dual(a, b, epsilon=4.0, solve_kw=()):
    """Regularized OT value ``<f, â> + <g, b̂>`` between grid densities,
    differentiable w.r.t. both densities via the envelope theorem.

    ``solve_kw``: hashable tuple of (key, value) pairs forwarded to
    :func:`sinkhorn.solve_annealed` (e.g. ``(("max_iter", 800),)``).
    """
    val, _ = _ot_fwd(a, b, epsilon, solve_kw)
    return val


def _ot_fwd(a, b, epsilon, solve_kw):
    kw = dict(solve_kw)
    a_hat, sa = _norm(a)
    b_hat, sb = _norm(b)
    res = sinkhorn.solve_annealed(a_hat, b_hat, epsilon, **kw)
    val = _dual_value(res, a_hat, b_hat)
    return val, (res.f, res.g, a_hat, b_hat, sa, sb)


def _ot_bwd(epsilon, solve_kw, saved, ct):
    f, g, a_hat, b_hat, sa, sb = saved
    return (ct * _centered(f, a_hat, sa), ct * _centered(g, b_hat, sb))


entropic_ot_dual.defvjp(_ot_fwd, _ot_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sinkhorn_divergence_dual(a, b, epsilon=4.0, solve_kw=()):
    """Debiased Sinkhorn divergence on the DUAL value,
    ``S = OT(a,b) - ½ OT(a,a) - ½ OT(b,b)`` — the quantity whose envelope
    gradient is exact and whose sqrt tracks W2 (Feydy et al.).  Three
    annealed solves forward, ZERO extra work backward.
    """
    val, _ = _div_fwd(a, b, epsilon, solve_kw)
    return val


def _div_fwd(a, b, epsilon, solve_kw):
    kw = dict(solve_kw)
    a_hat, sa = _norm(a)
    b_hat, sb = _norm(b)
    ab = sinkhorn.solve_annealed(a_hat, b_hat, epsilon, **kw)
    aa = sinkhorn.solve_annealed(a_hat, a_hat, epsilon, **kw)
    bb = sinkhorn.solve_annealed(b_hat, b_hat, epsilon, **kw)
    val = (_dual_value(ab, a_hat, b_hat)
           - 0.5 * _dual_value(aa, a_hat, a_hat)
           - 0.5 * _dual_value(bb, b_hat, b_hat))
    # the self-solve is symmetric (f = g) up to the final half-update;
    # average for robustness
    p_aa = 0.5 * (aa.f + aa.g)
    p_bb = 0.5 * (bb.f + bb.g)
    return val, (ab.f, ab.g, p_aa, p_bb, a_hat, b_hat, sa, sb)


def _div_bwd(epsilon, solve_kw, saved, ct):
    f_ab, g_ab, p_aa, p_bb, a_hat, b_hat, sa, sb = saved
    ga = _centered(f_ab - p_aa, a_hat, sa)
    gb = _centered(g_ab - p_bb, b_hat, sb)
    return (ct * ga, ct * gb)


sinkhorn_divergence_dual.defvjp(_div_fwd, _div_bwd)


def wasserstein2_dual(a, b, epsilon=4.0, solve_kw=()):
    """sqrt of the (clamped) debiased dual divergence — a differentiable
    W2 estimate in pixel units.  Plain composition: jax.grad flows
    through the sqrt into the custom envelope VJP."""
    s = sinkhorn_divergence_dual(a, b, epsilon, solve_kw)
    return jnp.sqrt(jnp.maximum(s, 1e-12))
