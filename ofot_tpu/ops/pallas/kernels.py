"""Pallas TPU kernels for the FOTO hot path.

Two kernels cover ~all of an ALG2 iteration's inner work:

  * ``project_paraboloid_pallas`` — stepB pointwise projection, the
    reference's dominant cost (80% of runtime as a Python loop, SURVEY.md
    §6).  One fused VPU pass over the (3, L) point set: membership test,
    both cubic-root branches, select — no intermediate HBM traffic.
  * ``cg_operator_pallas`` — the CG system operator
    ``y = -r * L_st(x) + r*eps*x`` (7-point space-time Laplacian fused with
    the axpy), executed entirely in VMEM.

``cg_operator_pallas`` holds whole (Nt, Ny, Nx) fp32 fields in VMEM — at
the reference's production shape (16, 240, 320) that is ~4.9 MB, well
under the ~16 MB/core budget; ``fits_in_vmem`` is the advisory sizing
check for callers that want to gate it (the production solver selection
happens in ``foto.resolve_stepA_solver``, and the chunked pointwise
kernels never exceed VMEM).  Transcendentals (cbrt via exp/log, arccos
via atan2-free polynomial-ready forms) are expressed with ops Mosaic
lowers natively.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = 1.4142135623730951
_TRIG_COEF = 2.0 * (2.0 / 3.0) ** 0.5
_ACOS_COEF = (3.0 / 2.0) ** 1.5

# VMEM working-set budget for the whole-array kernels (bytes)
_VMEM_BUDGET = 12 * 1024 * 1024


def _pallas_call(*args, **kw):
    """pl.pallas_call that interprets on the CPU backend.

    Mosaic kernels only compile for TPU; on CPU (tests, CLI with
    --platform=cpu and --stepA-solver=pallas) fall back to interpret mode
    instead of crashing, so one ops object works on every backend."""
    if jax.default_backend() == "cpu":
        kw.setdefault("interpret", True)
    return pl.pallas_call(*args, **kw)


def fits_in_vmem(shape, dtype=jnp.float32, n_buffers=2) -> bool:
    import numpy as np
    return int(np.prod(shape)) * jnp.dtype(dtype).itemsize * n_buffers \
        <= _VMEM_BUDGET


# ---------------------------------------------------------------- projection

def _project_core(alpha, rho2):
    """Cylindrical projection core shared by every stepB kernel: returns
    ``(inside, alpha_h, rho_h)`` for ``rho2 = |beta|^2`` (any number of
    beta components — the projection only acts on (alpha, |beta|))."""
    eps = jnp.asarray(1e-20, alpha.dtype)
    rho = jnp.sqrt(rho2)
    inside = 2.0 * alpha + rho2 <= 0.0

    ap1 = alpha + 1.0
    radicand = (4.0 / 3.0) * ap1 * ap1 * ap1 + 4.5 * rho2
    single = radicand > 0.0

    s = 0.25 * _SQRT2 * rho + (1.0 / 6.0) * jnp.sqrt(jnp.maximum(radicand, 0.0))
    # cbrt(s) for s >= 0, safe at 0
    c = jnp.exp(jnp.log(jnp.maximum(s, eps)) * (1.0 / 3.0))
    c = jnp.where(s > 0, c, 0.0)
    c_safe = jnp.where(c > 0, c, 1.0)
    zh_card = -(1.0 / 3.0) * ap1 / c_safe + c

    nam = jnp.maximum(-ap1, eps)
    acos_arg = jnp.clip(_ACOS_COEF * rho / (nam * jnp.sqrt(nam)), 0.0, 1.0)
    # cos(arccos(x)/3) without acos (unimplemented in Mosaic): it is the
    # root of 4c^3 - 3c = x in [cos(pi/6), 1], where Newton from c=1 is
    # monotone (p' >= 6); 5 iterations reach fp32 roundoff
    c3 = jnp.ones_like(acos_arg)
    for _ in range(5):
        c3 = c3 - (4.0 * c3 * c3 * c3 - 3.0 * c3 - acos_arg) / (
            12.0 * c3 * c3 - 3.0)
    zh_trig = _TRIG_COEF * jnp.sqrt(nam) * c3

    zh = jnp.where(single, zh_card, zh_trig)
    alpha_h = jnp.where(single, -zh * zh, -0.5 * zh * zh)
    rho_h = jnp.where(single, _SQRT2 * zh, zh)
    return inside, alpha_h, rho_h


def _project_point(alpha, beta1, beta2):
    """Branch-free paraboloid projection of (alpha, beta1, beta2) — the
    stepB math shared by the standalone and fused kernels."""
    eps = jnp.asarray(1e-20, alpha.dtype)

    rho2 = beta1 * beta1 + beta2 * beta2
    rho = jnp.sqrt(rho2)
    safe_rho = jnp.maximum(rho, eps)
    cos_t = jnp.where(rho > 0, beta1 / safe_rho, 1.0)
    sin_t = jnp.where(rho > 0, beta2 / safe_rho, 0.0)

    inside, alpha_h, rho_h = _project_core(alpha, rho2)

    return (jnp.where(inside, alpha, alpha_h),
            jnp.where(inside, beta1, rho_h * cos_t),
            jnp.where(inside, beta2, rho_h * sin_t))


def _project_point_nd(alpha, betas):
    """Projection with ``k = len(betas)`` beta components (k = 3 is the
    WFR/unbalanced stepB; ofot_tpu/ops/projection.py
    project_paraboloid_nd is the XLA twin): the beta direction is
    preserved, so all betas rescale by ``rho_h / rho`` (exactly 0/eps = 0
    at the rho = 0 apex case, where rho_h = 0)."""
    eps = jnp.asarray(1e-20, alpha.dtype)
    rho2 = betas[0] * betas[0]
    for b in betas[1:]:
        rho2 = rho2 + b * b
    inside, alpha_h, rho_h = _project_core(alpha, rho2)
    scale = jnp.where(inside, 1.0,
                      rho_h / jnp.maximum(jnp.sqrt(rho2), eps))
    return (jnp.where(inside, alpha, alpha_h),
            [b * scale for b in betas])


def _projection_kernel(p_ref, out_ref):
    k = p_ref.shape[0] - 1
    if k == 2:
        a, b1, b2 = _project_point(p_ref[0], p_ref[1], p_ref[2])
        out_ref[0], out_ref[1], out_ref[2] = a, b1, b2
    else:
        a, bs = _project_point_nd(p_ref[0],
                                  [p_ref[i] for i in range(1, k + 1)])
        out_ref[0] = a
        for i, b in enumerate(bs):
            out_ref[i + 1] = b


# per-grid-step chunk of points: up to (3, 8, 8192) f32 = 768 KB per block
_PROJ_ROWS = 8
_PROJ_COLS = 8192
_PROJ_CHUNK = _PROJ_ROWS * _PROJ_COLS


def _pick_cols(L: int) -> int | None:
    """Largest lane-aligned chunk width such that (8, cols) chunks tile L
    exactly — padding to a chunk multiple is NOT free (jnp.pad + the
    output slice copy every field through HBM, measured +38% on the fused
    ALG2 pointwise pass at the production shape), so exact tiling is the
    fast path and padding only the fallback for awkward sizes.  Every
    candidate must be a multiple of 128: the block specs and the fused
    kernel's (rows, cols//128, 128) criterion reduction require full
    lanes."""
    for cols in (8192, 6400, 5120, 4096, 3200, 2560, 2048, 1280,
                 1024, 768, 640, 512, 384, 256, 128):
        if L % (_PROJ_ROWS * cols) == 0:
            return cols
    return None


def _chunk3(arrs, L: int):
    """Reshape each (k, L)-flattenable array into lane-aligned chunks
    (k = component count from the array's leading axis; 3 for balanced
    stepB fields, 4 for WFR's source-extended ones).

    Returns ``(chunked_arrays, cols, n_chunks, pad)`` — exact tiling via
    :func:`_pick_cols` when possible, zero-padding to the default chunk
    otherwise.  Shared by the projection and fused-pointwise kernels so
    the tiling policy exists once."""
    cols = _pick_cols(L)
    pad = 0 if cols else (-L) % _PROJ_CHUNK
    cols = cols or _PROJ_COLS
    n_chunks = (L + pad) // (_PROJ_ROWS * cols)
    out = []
    for a in arrs:
        k = a.shape[0]
        a = a.reshape(k, L)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        out.append(a.reshape(k, n_chunks * _PROJ_ROWS, cols))
    return out, cols, n_chunks, pad


def _unchunk3(a, shape, L: int, pad: int):
    return a.reshape(a.shape[0], L + pad)[:, :L].reshape(shape)


@jax.jit
def project_paraboloid_pallas(p: jnp.ndarray) -> jnp.ndarray:
    """Pallas twin of ``ofot_tpu.ops.projection.project_paraboloid`` /
    ``project_paraboloid_nd`` (component count from ``p.shape[0]``).

    ``p``: (1+k, ...) -> same shape.  Points are flattened, zero-padded to
    a chunk multiple (zero points are inside K -> identity, so padding is
    harmless), and streamed through VMEM in (1+k, 8, 8192) blocks over a
    1-D grid — production shapes never exceed the VMEM budget.
    """
    shape = p.shape
    ncomp = shape[0]
    L = 1
    for d in shape[1:]:
        L *= d
    (p3,), cols, n_chunks, pad = _chunk3([p], L)
    out = _pallas_call(
        _projection_kernel,
        grid=(n_chunks,),
        out_shape=jax.ShapeDtypeStruct(p3.shape, p.dtype),
        in_specs=[pl.BlockSpec((ncomp, _PROJ_ROWS, cols),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ncomp, _PROJ_ROWS, cols),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )(p3)
    return _unchunk3(out, shape, L, pad)


# ------------------------------------------- fused stepB+stepC+criterion

def _fused_pointwise_kernel(r_ref, gphi_ref, mu_ref, q_ref, mu_out_ref,
                            acc_num_ref, acc_den_ref, *, qprev_ref=None):
    """One VMEM pass per chunk: stepB projection of the (optionally
    over-relaxed) field + mu/r, stepC dual update with density clamp, and
    the Hamilton–Jacobi criterion partial sums (reference
    benamou_brenier.py:214, 229-232, 246-251) — reads grad_phi/mu once
    and writes q/mu once instead of XLA's two separate fusion passes.

    ``qprev_ref`` (present iff admm_alpha != 1, r_ref holds [r, alpha]):
    stepB/stepC act on ``alpha*grad_phi + (1-alpha)*q_prev`` while the
    criterion keeps the TRUE grad_phi (matching foto.alg2_iteration's
    over-relaxed branch) — this is what lets the fused pass serve the
    production admm_alpha=1.7 default at large grids (round 4).

    Component count comes from the block shape: 1+2 betas is the balanced
    solver, 1+3 the WFR/unbalanced one (the extra beta is the scaled
    source dual; the criterion's speed^2 spans all betas in both cases,
    matching wfr.alg2_iteration)."""
    r = r_ref[0, 0]
    k = gphi_ref.shape[0] - 1
    g0 = gphi_ref[0]
    gb = [gphi_ref[i] for i in range(1, k + 1)]
    m0 = mu_ref[0]
    mb = [mu_ref[i] for i in range(1, k + 1)]

    if qprev_ref is None:
        x0, xb = g0, gb
    else:
        alpha = r_ref[0, 1]
        x0 = alpha * g0 + (1.0 - alpha) * qprev_ref[0]
        xb = [alpha * g + (1.0 - alpha) * qprev_ref[i + 1]
              for i, g in enumerate(gb)]

    q0, qb = _project_point_nd(x0 + m0 / r,
                               [x + m / r for x, m in zip(xb, mb)])
    q_ref[0] = q0
    for i, q in enumerate(qb):
        q_ref[i + 1] = q

    n0 = jnp.maximum(m0 + r * (x0 - q0), 0.0)   # density clamped >= 0
    mu_out_ref[0] = n0
    for i, (m, x, q) in enumerate(zip(mb, xb, qb)):
        mu_out_ref[i + 1] = m + r * (x - q)

    # criterion partials over this chunk, reduced to one (rows, 128) tile;
    # the TPU grid is a sequential loop, so accumulate across chunks
    speed2 = gb[0] * gb[0]
    for g in gb[1:]:
        speed2 = speed2 + g * g
    res = g0 + 0.5 * speed2
    rows, cols = n0.shape
    num = jnp.sum((n0 * jnp.abs(res)).reshape(rows, cols // 128, 128), axis=1)
    den = jnp.sum((n0 * speed2).reshape(rows, cols // 128, 128), axis=1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_num_ref[:] = jnp.zeros_like(acc_num_ref)
        acc_den_ref[:] = jnp.zeros_like(acc_den_ref)

    acc_num_ref[:] += num
    acc_den_ref[:] += den


@jax.jit
def fused_pointwise_pallas(grad_phi: jnp.ndarray, mu: jnp.ndarray, r,
                           alpha=None, q_prev: jnp.ndarray | None = None):
    """Fused stepB + stepC + HJ-criterion partials.

    ``grad_phi``, ``mu``: (1+k, Nt, Ny, Nx) with k = 2 (balanced) or 3
    (WFR source-extended).  Returns ``(q, mu_new, num, denom)`` with
    scalar criterion sums such that ``crit = sqrt(num / (denom + 1e-10))``.
    Zero padding is exact: padded points project to themselves (0 is
    inside K), update to 0, and contribute 0 to both sums.

    ``alpha``/``q_prev`` (both or neither): over-relaxed ADMM — stepB and
    stepC act on ``alpha*grad_phi + (1-alpha)*q_prev``, the criterion on
    the true grad_phi.  Costs one extra field read per chunk; padded
    q_prev points are 0, so padding stays exact.
    """
    shape = grad_phi.shape
    ncomp = shape[0]
    L = 1
    for d in shape[1:]:
        L *= d
    relaxed = q_prev is not None
    if alpha is not None and not relaxed:
        # silently running the un-relaxed update would let over-relaxation
        # no-op (review, round 4)
        raise ValueError("alpha given without q_prev")
    if relaxed and alpha is None:
        raise ValueError("q_prev given without alpha")
    arrs = [grad_phi, mu] + ([q_prev] if relaxed else [])
    chunked, cols, n_chunks, pad = _chunk3(arrs, L)
    if relaxed:
        params = jnp.stack([jnp.asarray(r, grad_phi.dtype),
                            jnp.asarray(alpha, grad_phi.dtype)]).reshape(1, 2)
        kernel = lambda p, g, m, qp, q, n, an, ad: \
            _fused_pointwise_kernel(p, g, m, q, n, an, ad, qprev_ref=qp)
        p_spec = pl.BlockSpec((1, 2), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
    else:
        params = jnp.asarray(r, grad_phi.dtype).reshape(1, 1)
        kernel = _fused_pointwise_kernel
        p_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)

    block = pl.BlockSpec((ncomp, _PROJ_ROWS, cols), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((_PROJ_ROWS, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    g3 = chunked[0]
    q3, n3, num, den = _pallas_call(
        kernel,
        grid=(n_chunks,),
        out_shape=(
            jax.ShapeDtypeStruct(g3.shape, grad_phi.dtype),
            jax.ShapeDtypeStruct(g3.shape, grad_phi.dtype),
            jax.ShapeDtypeStruct((_PROJ_ROWS, 128), grad_phi.dtype),
            jax.ShapeDtypeStruct((_PROJ_ROWS, 128), grad_phi.dtype),
        ),
        in_specs=[p_spec] + [block] * len(chunked),
        out_specs=(block, block, acc_spec, acc_spec),
    )(params, *chunked)

    q = _unchunk3(q3, shape, L, pad)
    mu_new = _unchunk3(n3, shape, L, pad)
    return q, mu_new, jnp.sum(num), jnp.sum(den)


# ------------------------------------------------- fused spectral stepA solve

def _dct_solve_slice_kernel(rlt_ref, F_ref, Cy_ref, Cx_ref, sb_ref,
                            out_ref):
    """One t-spectral slice of the stepA solve, entirely in VMEM:
    y-forward, x-forward, spectral divide, y-inverse, x-inverse — four
    MXU contractions and one VPU divide with no HBM round-trips between
    them.  ``rlt_ref`` holds ALL slices' ``-r * lambda_t`` shifts as a
    full (Nt, 1) SMEM block — Mosaic rejects per-step (1, 1) SMEM blocks
    (block shape must tile or equal the array) — and the kernel picks its
    slice by ``program_id``; ``sb_ref`` is the t-independent part of the
    spectrum."""
    prec = jax.lax.Precision.HIGHEST
    s = F_ref[0]
    dt = s.dtype
    # forward: Cy @ S @ Cx^T  (Cy/Cx are analysis matrices, rows = freq)
    t1 = jax.lax.dot_general(Cy_ref[:], s, (((1,), (0,)), ((), ())),
                             precision=prec, preferred_element_type=dt)
    t2 = jax.lax.dot_general(t1, Cx_ref[:], (((1,), (1,)), ((), ())),
                             precision=prec, preferred_element_type=dt)
    t2 = t2 / (sb_ref[:] + rlt_ref[pl.program_id(0), 0])
    # inverse: Cy^T @ (.) @ Cx
    t3 = jax.lax.dot_general(Cy_ref[:], t2, (((0,), (0,)), ((), ())),
                             precision=prec, preferred_element_type=dt)
    out_ref[0] = jax.lax.dot_general(t3, Cx_ref[:],
                                     (((1,), (0,)), ((), ())),
                                     precision=prec,
                                     preferred_element_type=dt)


def dct_solve_pallas(F: jnp.ndarray, r, reg_epsilon) -> jnp.ndarray:
    """Spectral stepA solve ``(-r*L_st + r*eps*I) phi = F`` with the whole
    2-D (y, x) transform pipeline fused into one Pallas kernel.

    Only the cheap t-axis contractions (K = Nt, bandwidth-bound) stay in
    XLA; a grid over the Nt t-frequencies runs y-fwd -> x-fwd -> divide ->
    y-inv -> x-inv per (Ny, Nx) slice in VMEM (~1.5 MB working set at the
    production shape).

    MEASURED NEGATIVE (v5e, tools/ab_stepa_fused.py, BENCHMARKS.md r4):
    device-time parity with the XLA 6-pass solve in isolation (0.153
    ms/apply chain-marginal both — the XLA solve already sits on the
    roofline; VERDICT.md r3's "2.4x gap" was the ~25 ms per-call dispatch
    constant contaminating an isolated 200-rep measurement) and a net
    LOSS inside the full ALG2 iteration (0.51 vs 0.44 ms/iter): the
    pallas_call boundary forfeits XLA's div_st -> stepA -> grad_st
    cross-fusion.  Production-shape only — the (Nx, Nx) transform matrix
    alone exceeds VMEM at 1080p.  Kept as a measured experimental
    backend (``--stepA-solver=dct-fused``).

    ``r`` / ``reg_epsilon`` are traced (same contract as
    ``dct.solve_stepA_dct``); the spectrum is assembled from its 1-D
    factors outside the kernel — a (Ny, Nx) base plus a per-slice SMEM
    scalar shift — so no (Nt, Ny, Nx) spectrum ever exists in HBM.
    Natural ('dense') frequency order throughout, matching
    ``dct._eigs_1d_np`` with no folding.
    """
    from ofot_tpu.solvers import dct as _dct

    Nt, Ny, Nx = F.shape
    dt = F.dtype
    prec = jax.lax.Precision.HIGHEST
    Ct = _dct._analysis_matrix(Nt, dt)
    Cy = _dct._analysis_matrix(Ny, dt)
    Cx = _dct._analysis_matrix(Nx, dt)
    lt = jnp.asarray(_dct._neumann_eigenvalues_np(Nt), dt)
    ly = jnp.asarray(_dct._neumann_eigenvalues_np(Ny), dt)
    lx = jnp.asarray(_dct._neumann_eigenvalues_np(Nx), dt)
    r = jnp.asarray(r, dt)
    reg_epsilon = jnp.asarray(reg_epsilon, dt)
    sb = -r * (ly[:, None] + lx[None, :]) + r * reg_epsilon   # (Ny, Nx)
    rlt = (-r * lt).reshape(Nt, 1)

    # t-forward (K = Nt: tiny MXU work, bandwidth-bound — XLA is fine)
    Fz = jnp.tensordot(Ct, F, axes=([1], [0]), precision=prec)

    mat = lambda m: pl.BlockSpec(m.shape, lambda t: (0, 0),
                                 memory_space=pltpu.VMEM)
    Fz = _pallas_call(
        _dct_solve_slice_kernel,
        grid=(Nt,),
        out_shape=jax.ShapeDtypeStruct((Nt, Ny, Nx), dt),
        in_specs=[pl.BlockSpec((Nt, 1), lambda t: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, Ny, Nx), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  mat(Cy), mat(Cx), mat(sb)],
        out_specs=pl.BlockSpec((1, Ny, Nx), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rlt, Fz, Cy, Cx, sb)

    # t-inverse
    return jnp.tensordot(Ct, Fz, axes=([0], [0]), precision=prec)


# ---------------------------------------------------------------- CG operator

def _shift_axis(x, offset, axis):
    """out[i] = x[i+offset], zero-filled, via static slices + concat."""
    n = x.shape[axis]
    idx_body = [slice(None)] * x.ndim
    idx_zero = [slice(None)] * x.ndim
    if offset == 1:
        idx_body[axis] = slice(1, n)
        idx_zero[axis] = slice(0, 1)
        body = x[tuple(idx_body)]
        zero = jnp.zeros_like(x[tuple(idx_zero)])
        return jnp.concatenate([body, zero], axis=axis)
    idx_body[axis] = slice(0, n - 1)
    idx_zero[axis] = slice(0, 1)
    body = x[tuple(idx_body)]
    zero = jnp.zeros_like(x[tuple(idx_zero)])
    return jnp.concatenate([zero, body], axis=axis)


def _lap1d_n(x, axis):
    """3-point Laplacian with the reference's 'N' boundary rows, h=1."""
    out = _shift_axis(x, 1, axis) - 2.0 * x + _shift_axis(x, -1, axis)
    # 'N' rows: (-x0 + x1) and (-x_last + x_prev)
    idx0 = [slice(None)] * x.ndim
    idx1 = [slice(None)] * x.ndim
    idxl = [slice(None)] * x.ndim
    idxp = [slice(None)] * x.ndim
    n = x.shape[axis]
    idx0[axis] = slice(0, 1)
    idx1[axis] = slice(1, 2)
    idxl[axis] = slice(n - 1, n)
    idxp[axis] = slice(n - 2, n - 1)
    row0 = -x[tuple(idx0)] + x[tuple(idx1)]
    rowl = -x[tuple(idxl)] + x[tuple(idxp)]
    mid_idx = [slice(None)] * x.ndim
    mid_idx[axis] = slice(1, n - 1)
    return jnp.concatenate([row0, out[tuple(mid_idx)], rowl], axis=axis)


def _cg_op_kernel(x_ref, out_ref, *, r, reg_epsilon):
    x = x_ref[:]
    lap = _lap1d_n(x, 0) + _lap1d_n(x, 1) + _lap1d_n(x, 2)
    out_ref[:] = -r * lap + (r * reg_epsilon) * x


@functools.partial(jax.jit, static_argnames=("r", "reg_epsilon"))
def cg_operator_pallas(x: jnp.ndarray, r: float = 1.0,
                       reg_epsilon: float = 1e-2) -> jnp.ndarray:
    """Fused ``-r * laplacian_st(x, bc='N') + r*eps*x`` on a (Nt, Ny, Nx)
    field, entirely in VMEM.

    NOTE: matches the XLA twin in interpret mode, but the concat-heavy
    whole-array form currently crashes this environment's remote Mosaic
    compiler (production shapes) — superseded by the blocked rewrite
    :func:`cg_operator_pallas_blocked` (VERDICT.md r3 item 5), kept only
    as the simplest reference form for interpret-mode comparison."""
    return _pallas_call(
        functools.partial(_cg_op_kernel, r=r, reg_epsilon=reg_epsilon),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# sublane-dim halo: Mosaic requires 8-aligned DMA slice starts/sizes, so
# the single stencil row comes with a full 8-row pad
_HALO_Y = 8


def _pick_by(Ny: int) -> int:
    """Largest row-block height dividing Ny, a multiple of 8, <= 128
    (Mosaic block rule: second-to-last dim multiple of 8 or whole axis);
    falls back to the whole axis.  Callers pass an 8-rounded Ny."""
    for by in range(128, 7, -8):
        if Ny % by == 0:
            return by
    return Ny


def _cg_op_blocked_kernel(p_ref, x_hbm, out_ref, cur, prev, nxt, sem, *,
                          Nt, Ny, Nx, Nxp, By):
    """One (t, y-block) tile of the stepA operator, halo rows staged by
    explicit DMA — no whole-array concats (the construct that crashed the
    remote Mosaic compiler in the round-3 kernel), no overlapping
    BlockSpecs.

    ``x_hbm`` is the zero-padded field (Nt+2, Ny+2, Nx) left in HBM/ANY;
    each grid step copies its (By+2, Nx) center slice plus same-row
    slices of the t-neighbors into VMEM.  Zero padding makes the DMA
    windows uniform AND implements the 'N' boundary stencil: the
    reference row form -x0 + x1 equals (0 - 2*x0 + x1) + x0, i.e. the
    interior stencil against a zero halo plus a boundary-masked +x
    correction (reference operators.py:104-108 semantics, quirk-faithful
    like ops/stencils.py)."""
    t = pl.program_id(0)
    yb = pl.program_id(1)
    # Mosaic requires DMA slice starts/sizes in the sublane dim to be
    # 8-aligned, so the halo is a full 8-row pad (not 1): every window is
    # (By + 16) rows starting at the 8-aligned yb*By
    H = _HALO_Y
    win = (pl.ds(yb * By, By + 2 * H), slice(None))
    d_cur = pltpu.make_async_copy(x_hbm.at[(t + 1, *win)], cur, sem.at[0])
    d_prev = pltpu.make_async_copy(x_hbm.at[(t, *win)], prev, sem.at[1])
    d_next = pltpu.make_async_copy(x_hbm.at[(t + 2, *win)], nxt, sem.at[2])
    d_cur.start()
    d_prev.start()
    d_next.start()
    d_cur.wait()
    d_prev.wait()
    d_next.wait()

    w = cur[:]
    c = slice(H, By + H)                      # 8-aligned center window
    xc = w[c, :]
    # up/down neighbors via roll-then-aligned-slice (an unaligned static
    # slice would hit the same 8-alignment rule); the circular wrap only
    # touches rows 0 / By+2H-1, outside the sliced window
    up = pltpu.roll(w, 1, 0)[c, :]
    dn = pltpu.roll(w, By + 2 * H - 1, 0)[c, :]      # shift -1 (circular)
    lap_y = up + dn - 2.0 * xc
    rows = jax.lax.broadcasted_iota(jnp.int32, (By, Nxp), 0) + yb * By
    lap_y = lap_y + jnp.where((rows == 0) | (rows == Ny - 1), xc, 0.0)

    cols = jax.lax.broadcasted_iota(jnp.int32, (By, Nxp), 1)
    xl = jnp.where(cols == 0, 0.0, pltpu.roll(xc, 1, 1))
    # pltpu.roll requires a non-negative shift: Nxp-1 == -1 (circular)
    xr = jnp.where(cols == Nx - 1, 0.0, pltpu.roll(xc, Nxp - 1, 1))
    lap_x = xl + xr - 2.0 * xc
    lap_x = lap_x + jnp.where((cols == 0) | (cols == Nx - 1), xc, 0.0)

    lap_t = prev[c, :] + nxt[c, :] - 2.0 * xc
    t_edge = (t == 0) | (t == Nt - 1)
    lap_t = lap_t + jnp.where(t_edge, xc, 0.0)

    r = p_ref[0, 0]
    reg_epsilon = p_ref[0, 1]
    out_ref[0] = -r * (lap_t + lap_y + lap_x) + (r * reg_epsilon) * xc


@jax.jit
def cg_operator_pallas_blocked(x: jnp.ndarray, r=1.0,
                               reg_epsilon=1e-2) -> jnp.ndarray:
    """Blocked Pallas form of the CG system operator
    ``-r * laplacian_st(x, bc='N') + r*eps*x`` (VERDICT.md r3 item 5).

    Grid over (Nt, Ny/By) tiles; halo rows staged into VMEM by explicit
    DMA from a zero-padded HBM copy (see the kernel docstring for why
    padding encodes the 'N' boundary rows exactly).  Compiles on the real
    Mosaic backend at the production and 1080p shapes — unlike the
    whole-array concat form it replaces; measured numbers in
    BENCHMARKS.md.  Exposed to the solvers as the ``cg-pallas`` stepA
    backend (``foto.stepA_ops``)."""
    Nt, Ny, Nx = x.shape
    # 8/128-rounded extents: Mosaic's memref_slice (the DMA windows) must
    # be tile-aligned in BOTH trailing dims; masks below use the real
    # Ny/Nx and the rounding columns/rows are sliced off the output
    Ny_eff = -(-Ny // 8) * 8
    Nx_eff = -(-Nx // 128) * 128
    By = _pick_by(Ny_eff)
    H = _HALO_Y
    xp = jnp.pad(x, ((1, 1), (H, H + (Ny_eff - Ny)), (0, Nx_eff - Nx)))
    # r / reg_epsilon traced via SMEM so the kernel can sit inside the
    # jitted ALG2 loop, where both arrive as tracers (same contract as
    # dct.solve_stepA_dct)
    params = jnp.stack([jnp.asarray(r, x.dtype),
                        jnp.asarray(reg_epsilon, x.dtype)]).reshape(1, 2)
    return _pallas_call(
        functools.partial(_cg_op_blocked_kernel,
                          Nt=Nt, Ny=Ny, Nx=Nx, Nxp=Nx_eff, By=By),
        grid=(Nt, Ny_eff // By),
        out_shape=jax.ShapeDtypeStruct((Nt, Ny_eff, Nx_eff), x.dtype),
        in_specs=[pl.BlockSpec((1, 2), lambda t, yb: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, By, Nx_eff), lambda t, yb: (t, yb, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((By + 2 * H, Nx_eff), x.dtype),
            pltpu.VMEM((By + 2 * H, Nx_eff), x.dtype),
            pltpu.VMEM((By + 2 * H, Nx_eff), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(params, xp)[:, :Ny, :Nx]
