"""Differentiable OT values (solvers/otgrad.py): envelope-theorem
gradients w.r.t. the input densities, validated against central finite
differences.  Runs in f64 (conftest enables x64) so the FD comparison
is meaningful."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofot_tpu.solvers import otgrad

KW = (("max_iter", 1500), ("tol", 1e-9))


def _pair(n=24, shift=(3.0, 2.0)):
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    blob = lambda cy, cx: np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / 14) \
        + 1e-4
    c = n / 2
    return (jnp.asarray(blob(c - shift[0] / 2, c - shift[1] / 2)),
            jnp.asarray(blob(c + shift[0] / 2, c + shift[1] / 2)))


def _fd(fn, a, i, j, h=1e-5):
    e = np.zeros(a.shape)
    e[i, j] = h
    return (float(fn(a + e)) - float(fn(a - e))) / (2 * h)


def test_entropic_value_grad_matches_fd():
    a, b = _pair()
    val, (ga, gb) = jax.value_and_grad(
        otgrad.entropic_ot_dual, argnums=(0, 1))(a, b, 4.0, KW)
    assert np.isfinite(float(val))
    rng = np.random.RandomState(0)
    for _ in range(3):
        i, j = rng.randint(0, 24, 2)
        fd = _fd(lambda aa: otgrad.entropic_ot_dual(aa, b, 4.0, KW), a, i, j)
        assert float(ga[i, j]) == pytest.approx(fd, rel=1e-3, abs=1e-6)
        fd = _fd(lambda bb: otgrad.entropic_ot_dual(a, bb, 4.0, KW), b, i, j)
        assert float(gb[i, j]) == pytest.approx(fd, rel=1e-3, abs=1e-6)


def test_divergence_grad_matches_fd():
    a, b = _pair()
    _, (ga, gb) = jax.value_and_grad(
        otgrad.sinkhorn_divergence_dual, argnums=(0, 1))(a, b, 4.0, KW)
    rng = np.random.RandomState(1)
    for _ in range(3):
        i, j = rng.randint(0, 24, 2)
        fd = _fd(lambda aa: otgrad.sinkhorn_divergence_dual(
            aa, b, 4.0, KW), a, i, j)
        assert float(ga[i, j]) == pytest.approx(fd, rel=1e-3, abs=1e-6)
        fd = _fd(lambda bb: otgrad.sinkhorn_divergence_dual(
            a, bb, 4.0, KW), b, i, j)
        assert float(gb[i, j]) == pytest.approx(fd, rel=1e-3, abs=1e-6)


def test_w2_dual_tracks_translation():
    a, b = _pair(shift=(4.0, 3.0))          # true W2 = 5
    w2 = otgrad.wasserstein2_dual(a, b, 4.0, KW)
    assert float(w2) == pytest.approx(5.0, rel=0.02)
    # and it is differentiable through the sqrt composition
    g = jax.grad(otgrad.wasserstein2_dual)(a, b, 4.0, KW)
    assert np.isfinite(np.asarray(g)).all()


def test_gradient_step_decreases_divergence():
    """One mirror-descent (multiplicative) step along -grad must reduce
    S — the mechanism behind tools/w2_gradient_flow.py."""
    a, b = _pair(shift=(4.0, 0.0))
    val0, g = jax.value_and_grad(
        otgrad.sinkhorn_divergence_dual)(a, b, 4.0, KW)
    a1 = a * jnp.exp(-2.0 * g)              # mass-positive update
    a1 = a1 * jnp.sum(a) / jnp.sum(a1)      # keep total mass
    val1 = otgrad.sinkhorn_divergence_dual(a1, b, 4.0, KW)
    assert float(val1) < float(val0)
