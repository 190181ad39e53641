"""Shared harness for the chain-marginal A/B tools.

One definition of the timing methodology (probe-scalar best-of-N walls,
renormalized operator chains) so `ab_stepa_fused.py` and
`ab_cg_pallas.py` cannot silently diverge (review, round 4).

Chain-marginal method: time the same jitted program at N and 5N inner
applications; marginal = (t_5N - t_N) / 4N.  The per-call dispatch
constant (~25 ms through this environment's TPU tunnel even on healthy
days) cancels exactly; the 5x spread keeps +-tens-of-ms wall noise below
~0.05 ms/apply in the estimate.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def blob_pair(ny, nx, dtype=np.float32):
    """Mass-normalized Gaussian blob pair (bench.py's benchmark fixture)."""
    y, x = np.mgrid[0:ny, 0:nx].astype(dtype)

    def blob(cy, cx):
        return np.exp(-(((y - cy) / (ny / 6)) ** 2
                        + ((x - cx) / (nx / 6)) ** 2))

    f1 = blob(ny / 2 - ny / 12, nx / 2 - nx / 12)
    f2 = blob(ny / 2 + ny / 12, nx / 2 + nx / 12)
    f1, f2 = f1 / f1.sum(), f2 / f2.sum()
    scale = max(f1.max(), f2.max())
    return f1 / scale, f2 / scale


def chain(op, n):
    """Jitted n-fold application of ``op(x, r, eps)`` with per-step
    max-renormalization (solves/operators amplify by up to 1/(r*eps) per
    apply — a raw chain overflows)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def run(x):
        def body(_, y):
            z = op(y, 1.0, 1e-2)
            return z / jnp.max(jnp.abs(z))
        return lax.fori_loop(0, n, body, x)
    return jax.jit(run)


def timed(name, fn, *args, repeats=6):
    """Best-of-N wall of ``fn(*args)`` with a single forced host read
    (block_until_ready can return early on this platform).  Returns the
    best wall in seconds; prints compile + best to stderr."""
    import jax.numpy as jnp

    t0 = time.time()
    out = fn(*args)
    probe = float(jnp.asarray(out).ravel()[0])
    comp = time.time() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, time.time() - t0)
    print(f"[{name:>16}] compile {comp:6.1f}s  best {best*1e3:8.2f} ms"
          f"  probe={probe:.3e}", file=sys.stderr)
    return best
