"""FOTO — Benamou–Brenier dynamic optimal transport via ALG2/ADMM.

TPU-native re-design of the reference solver (reference
benamou_brenier.py:151-271): the entire ALG2 iteration — Poisson-like CG
solve (stepA), pointwise paraboloid projection (stepB), dual ascent (stepC)
and the Hamilton–Jacobi convergence criterion — runs as one jitted
``lax.while_loop`` on (3, Nt, Ny, Nx) arrays, with no host round-trips
inside the loop.

Algorithm parity notes (SURVEY.md §2 C6):
  * grid spacings dt = dx = dy = 1 (reference benamou_brenier.py:185-187);
  * ``A = -r * L_st + r * eps * I`` with the independently-built 7-point
    space-time Laplacian, NOT div_st @ grad_st (quirk 3);
  * stepA RHS gets non-homogeneous Neumann time-boundary corrections
    injecting rho0 / rhoT (reference benamou_brenier.py:72-82);
  * inner CG: rtol=1e-6, maxiter=1000, scipy convergence test
    (reference benamou_brenier.py:85);
  * stepC clamps the density channel at 0 (reference benamou_brenier.py:232);
  * stopping: crit <= tol, or stagnation |crit_prev - crit| < 1e-5 once a
    previous criterion exists (reference benamou_brenier.py:254-258).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ofot_tpu.ops import operators
from ofot_tpu.ops.projection import project_paraboloid, project_paraboloid_nd


class _DefaultOps:
    """Single-device space-time operator set (plain XLA stencils + jnp.sum).

    The solver only touches operators through this interface; handing it a
    ``ofot_tpu.parallel.halo.ShardedOps`` instead runs the identical ALG2
    loop inside ``shard_map`` with ppermute halos and psum reductions, and
    ``PallasOps`` swaps the hot inner ops for fused Pallas TPU kernels.
    """
    grad_st = staticmethod(operators.grad_st)
    div_st = staticmethod(operators.div_st)
    laplacian_st = staticmethod(operators.laplacian_st)
    sum = staticmethod(jnp.sum)
    # global max — ShardedOps overrides with a pmax so data-dependent
    # scalars (auto_r) agree across tiles under shard_map
    max = staticmethod(jnp.max)
    project = staticmethod(project_paraboloid)
    # k-beta-component projection for the source-extended (WFR) stepB
    project_nd = staticmethod(project_paraboloid_nd)

    def cg_operator(self, r, reg_epsilon):
        """The stepA system operator A = -r*L_st + r*eps*I as a callable."""
        return lambda phi: (-r * self.laplacian_st(phi, bc="N")
                            + (r * reg_epsilon) * phi)

    def stepA_solve(self, F, r, reg_epsilon, cg_rtol, cg_maxiter):
        """Solve A phi = F; returns (phi, inner_iterations).  Default:
        matrix-free CG with the reference's scipy-cg semantics."""
        from ofot_tpu.solvers.cg import cg
        res = cg(self.cg_operator(r, reg_epsilon), F, rtol=cg_rtol,
                 maxiter=cg_maxiter, dot=lambda a, b: self.sum(a * b))
        return res.x, res.iterations

    def __hash__(self):           # usable as a jit static argument
        return hash(type(self))

    def __eq__(self, other):
        return type(self) is type(other)


class DCTOps(_DefaultOps):
    """Spectral stepA: the Neumann space-time operator is diagonal in the
    DCT-II tensor basis, so stepA solves exactly with six MXU matmul
    transforms + a pointwise divide (ofot_tpu/solvers/dct.py) instead of
    hundreds of CG iterations.

    ``precision``: transform matmul precision (None = HIGHEST, 6 bf16 MXU
    passes — full f32).  ``jax.lax.Precision.HIGH`` (3 passes) halves the
    transform MXU work; see BENCHMARKS.md for where that pays off."""

    def __init__(self, precision=None):
        self.precision = precision

    def stepA_solve(self, F, r, reg_epsilon, cg_rtol, cg_maxiter):
        from ofot_tpu.solvers.dct import solve_stepA_dct
        return solve_stepA_dct(F, r=r, reg_epsilon=reg_epsilon,
                               precision=self.precision), jnp.int32(1)

    def __hash__(self):
        return hash((type(self), self.precision))

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.precision == other.precision)


class DCTRefinedOps(DCTOps):
    """Spectral stepA with low-precision MXU transforms + f32 iterative
    refinement (ofot_tpu/solvers/dct.py:solve_stepA_dct_refined): the same
    exact-solve accuracy class at (1+refine)/6 of the HIGHEST-precision MXU
    work.  ``refine`` counts refinement steps (each = one cheap f32 stencil
    residual + one low-precision spectral solve); bf16 transforms need 3 to
    reach the production ALG2 tolerance (measured, see the solver
    docstring)."""

    def __init__(self, refine: int = 3, precision=None):
        self.refine = int(refine)
        self.precision = (jax.lax.Precision.DEFAULT if precision is None
                          else precision)

    def stepA_solve(self, F, r, reg_epsilon, cg_rtol, cg_maxiter):
        from ofot_tpu.solvers.dct import solve_stepA_dct_refined
        phi = solve_stepA_dct_refined(F, r=r, reg_epsilon=reg_epsilon,
                                      refine=self.refine,
                                      precision=self.precision)
        return phi, jnp.int32(1 + self.refine)

    def __hash__(self):
        return hash((type(self), self.refine, self.precision))

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.refine == other.refine
                and self.precision == other.precision)


class DCTFusedOps(DCTOps):
    """Spectral stepA with the (y, x) transform pipeline fused into one
    Pallas VMEM kernel (ofot_tpu/ops/pallas/kernels.py:dct_solve_pallas).

    MEASURED NEGATIVE on v5e at the production shape (VERDICT.md r3
    item 1; tools/ab_stepa_fused.py, BENCHMARKS.md round 4): chain
    marginals put the fused kernel at device-time PARITY with the XLA
    6-pass solve (0.153 ms/apply both — the XLA path already sits on the
    stepA roofline; r3's "2.4x off roofline" was per-call dispatch
    constant contaminating an isolated measurement), and in the full
    ALG2 iteration the kernel LOSES (0.51 vs 0.44 ms/iter): pallas_call
    is a fusion barrier, so the div_st -> stepA -> grad_st cross-fusion
    XLA performs is forfeited.  Kept as a measured experimental backend;
    production-shape only (the per-slice VMEM working set exceeds 16 MB
    at 1080p: Cx alone is 14.7 MB)."""

    def stepA_solve(self, F, r, reg_epsilon, cg_rtol, cg_maxiter):
        from ofot_tpu.ops.pallas import kernels
        return kernels.dct_solve_pallas(F, r, reg_epsilon), jnp.int32(1)


class PallasOps(DCTOps):
    """TPU production set: spectral stepA + one fused Pallas VMEM pass for
    stepB projection + stepC dual update + criterion partials
    (ofot_tpu/ops/pallas/kernels.py) — grad_phi and mu are read from HBM
    once per iteration instead of once per sub-step.  stepA stays the XLA
    spectral solve: the Pallas-fused variant measured slower in-context
    and cannot fit VMEM at the large shapes where this ops set is
    auto-selected (see DCTFusedOps)."""

    @staticmethod
    def project(p):
        from ofot_tpu.ops.pallas import kernels
        return kernels.project_paraboloid_pallas(p)

    # the Pallas projection/fused kernels read the component count from
    # the array, so the same entry serves balanced (3) and WFR (4) states
    project_nd = project

    @staticmethod
    def fused_pointwise(grad_phi, mu, r, alpha=None, q_prev=None):
        from ofot_tpu.ops.pallas import kernels
        return kernels.fused_pointwise_pallas(grad_phi, mu, r,
                                              alpha=alpha, q_prev=q_prev)


class PallasCGOps(_DefaultOps):
    """Reference-faithful CG stepA with the system operator's SpMV as the
    blocked Pallas stencil kernel (VERDICT.md r3 item 5;
    ofot_tpu/ops/pallas/kernels.py:cg_operator_pallas_blocked) — the
    7-point space-time Laplacian fused with the axpy in one VMEM pass per
    (t, y-block) tile, halo rows staged by explicit DMA.  Same CG
    semantics as DEFAULT_OPS; measured against the XLA stencil body in
    BENCHMARKS.md."""

    def cg_operator(self, r, reg_epsilon):
        from ofot_tpu.ops.pallas import kernels
        return lambda phi: kernels.cg_operator_pallas_blocked(
            phi, r, reg_epsilon)


DEFAULT_OPS = _DefaultOps()
DCT_OPS = DCTOps()
PALLAS_OPS = PallasOps()


def resolve_stepA_solver(solver: str, platform: str, npts: int) -> str:
    """Resolve the user-facing stepA solver name (shared by the CLI and the
    batched sweep so both always pick the same backend for the same grid).

    ``auto``: reference-faithful CG on cpu/gpu; plain spectral (dct) on
    TPU at every size.  History: round 2 measured the fused Pallas
    pointwise pass ('pallas') ahead at 1080p (16.9 vs 18.1 ms/iter) and
    auto picked it above ~4M points; the round-4 re-measure shows XLA's
    own pointwise fusion has caught up — dct 15.15 / pallas 15.16 at
    1080p, dct 87.1 / pallas 89.2 at 4K (BENCHMARKS.md) — so auto now
    prefers the simpler XLA path everywhere and 'pallas' remains a
    selectable backend.
    """
    if solver == "auto":
        if platform in ("cpu", "gpu"):
            return "cg"
        return "dct"
    return solver


def stepA_ops(solver: str):
    """Map a resolved solver name to its ops set (ValueError on unknown)."""
    try:
        return {"cg": DEFAULT_OPS, "dct": DCT_OPS, "pallas": PALLAS_OPS,
                "dct-refined": DCTRefinedOps(),
                "dct-fused": DCTFusedOps(),
                "cg-pallas": PallasCGOps()}[solver]
    except KeyError:
        raise ValueError(f"unknown stepA_solver {solver!r}")


class FotoState(NamedTuple):
    """Carry of the ALG2 loop — also the checkpointable solver state."""
    mu: jnp.ndarray        # (3, Nt, Ny, Nx)  density + momenta
    q: jnp.ndarray         # (3, Nt, Ny, Nx)  auxiliary (a, b1, b2)
    phi: jnp.ndarray       # (Nt, Ny, Nx)     potential
    crit: jnp.ndarray      # scalar, -1 before first iteration
    prev_crit: jnp.ndarray
    iteration: jnp.ndarray     # int32
    cg_iterations: jnp.ndarray  # int32, cumulative inner CG iterations
    done: jnp.ndarray          # bool


class FotoResult(NamedTuple):
    u: jnp.ndarray        # (Ny, Nx) displacement x
    v: jnp.ndarray        # (Ny, Nx) displacement y
    m: jnp.ndarray        # (Ny, Nx) luminosity = -div(u, v)
    state: FotoState


def init_state(rho0: jnp.ndarray, rhoT: jnp.ndarray, Nt: int) -> FotoState:
    """Initial ALG2 state: density channel linearly interpolated in time
    between rho0 and rhoT, momenta and duals zero
    (reference benamou_brenier.py:191-194)."""
    dtype = rho0.dtype
    w = jnp.arange(Nt, dtype=dtype)[:, None, None] / (Nt - 1)
    rho_init = (1.0 - w) * rho0[None] + w * rhoT[None]
    # zeros derived from the inputs (not fresh constants) so that under
    # shard_map the whole carry is uniformly device-varying (JAX vma rules)
    zero = rho_init * 0.0
    mu = jnp.stack([rho_init, zero, zero])
    z = jnp.zeros((), dtype)
    return FotoState(
        mu=mu, q=mu * 0.0, phi=zero,
        crit=z - 1.0, prev_crit=z - 1.0,
        iteration=jnp.int32(0), cg_iterations=jnp.int32(0),
        done=jnp.asarray(False))


def _stepA(mu, q, rho0, rhoT, r, reg_epsilon, cg_rtol, cg_maxiter,
           ops=DEFAULT_OPS):
    """Solve A phi = div_st(mu - r q) + time-BC terms with matrix-free CG
    (reference benamou_brenier.py:26-91)."""
    dt = 1.0
    F = ops.div_st(mu - r * q, bc="N")
    rho, a = mu[0], q[0]
    g0 = rho0 - rho[0] + r * a[0]
    gN = rhoT - rho[-1] + r * a[-1]
    # boundary-slice adds expressed as masked full-field adds: they fuse
    # into the div_st pass instead of costing dynamic-update-slices
    # (profiled at ~18% of device time per ALG2 iteration)
    Nt = F.shape[0]
    t_idx = lax.broadcasted_iota(jnp.int32, F.shape, 0)
    F = F + jnp.where(t_idx == 0, -(1.0 / dt) * g0[None], 0.0)
    F = F + jnp.where(t_idx == Nt - 1, (1.0 / dt) * gN[None], 0.0)

    return ops.stepA_solve(F, r, reg_epsilon, cg_rtol, cg_maxiter)


def alg2_iteration(state: FotoState, rho0, rhoT, *, r, reg_epsilon,
                   convergence_tol, cg_rtol=1e-6, cg_maxiter=1000,
                   verbose=False, max_it=100, ops=DEFAULT_OPS,
                   admm_alpha=1.0) -> FotoState:
    """One full ALG2 iteration: stepA + stepB + stepC + criterion.

    ``admm_alpha`` (net-new vs reference): standard ADMM over-relaxation —
    stepB/stepC act on ``alpha*grad_phi + (1-alpha)*q_prev`` instead of
    ``grad_phi``.  alpha=1.0 is the reference's exact iteration; alpha in
    (1, 2) typically converges in substantially fewer iterations to the
    same fixed point (the saddle of the augmented Lagrangian is unchanged).
    Must be a static Python float.
    """
    mu, q_prev = state.mu, state.q

    phi, cg_iters = _stepA(mu, q_prev, rho0, rhoT, r, reg_epsilon,
                           cg_rtol, cg_maxiter, ops)

    grad_phi = ops.grad_st(phi, bc="N")
    relaxed = (grad_phi if admm_alpha == 1.0 else
               admm_alpha * grad_phi + (1.0 - admm_alpha) * q_prev)
    fused = getattr(ops, "fused_pointwise", None)
    if fused is not None and admm_alpha == 1.0:
        # stepB + stepC + criterion partials in one VMEM pass
        q, mu, num, denom = fused(grad_phi, mu, r)
    elif fused is not None:
        # over-relaxed form: the kernel builds alpha*grad_phi +
        # (1-alpha)*q_prev internally and keeps the criterion on the true
        # grad_phi — so the production admm_alpha=1.7 default retains the
        # fused pass at large grids (round 4)
        q, mu, num, denom = fused(grad_phi, mu, r, admm_alpha, q_prev)
    else:
        q = ops.project(relaxed + mu / r)

        mu = mu + r * (relaxed - q)
        # density positivity as a masked select over the whole stack (fuses
        # into the update above; no dynamic-update-slice)
        comp = lax.broadcasted_iota(jnp.int32, mu.shape, 0)
        mu = jnp.where(comp == 0, jnp.maximum(mu, 0.0), mu)

        # Hamilton–Jacobi residual criterion
        # (reference benamou_brenier.py:246-251)
        res = grad_phi[0] + 0.5 * (grad_phi[1] ** 2 + grad_phi[2] ** 2)
        num = ops.sum(mu[0] * jnp.abs(res))
        denom = ops.sum(mu[0] * (grad_phi[1] ** 2 + grad_phi[2] ** 2))
    crit = jnp.sqrt(num / (denom + 1e-10))

    prev_crit = state.crit
    done = (crit <= convergence_tol) | (
        (prev_crit >= 0) & (jnp.abs(prev_crit - crit) < 1e-5))
    # divergence guard (net-new vs reference, SURVEY.md §5 "failure
    # detection"): a NaN criterion means the solve blew up — stop instead
    # of burning the remaining iterations on NaNs
    done = done | jnp.isnan(crit)

    if verbose:
        jax.debug.print("{c} ({i}/{m})", c=crit, i=state.iteration + 1,
                        m=max_it)

    return FotoState(mu=mu, q=q, phi=phi, crit=crit, prev_crit=prev_crit,
                     iteration=state.iteration + 1,
                     cg_iterations=state.cg_iterations + cg_iters,
                     done=done)


def scale_invariant_r(rho0, rhoT, r=1.0, ops=DEFAULT_OPS):
    """ADMM penalty matched to the data scale: ``r * max(rho)``.

    The ALG2 iteration is exactly invariant under ``(mu, rho, r) ->
    (c*mu, c*rho, c*r)`` (every update is jointly 1-homogeneous: stepA's
    system and RHS both scale by c, stepB's argument ``grad_phi + mu/r``
    is unchanged, stepC's ``mu += r*(grad_phi - q)`` scales by c), so the
    *ratio* r/peak-density is what governs convergence — not r itself.
    The reference hardcodes r=1 for peak~1 inputs (run.sh:114 on
    normalize_image.py-prepared frames, both divided by their common max);
    feed it unit-MASS densities (peak ~1e-2 at VGA) instead and the same
    r=1 is ~100x over-penalized — ALG2 stalls on the stagnation guard
    having moved almost no mass (measured: mass-weighted displacement
    0.03 of a true 4 px at 48x56).  ``r_eff = r * max(rho)`` reproduces
    the peak-1 behavior at ANY input scaling.  Traced (data-dependent),
    so it works under vmap; under shard_map the max runs through
    ``ops.max`` (a pmax in ShardedOps) so every tile agrees on the
    penalty — a plain jnp.max is tile-local there and would silently
    give each device a different ADMM iteration (review, round 4).
    """
    return r * jnp.maximum(ops.max(rho0), ops.max(rhoT))


def alg2_loop(rho0, rhoT, Nt, *, r=1.0, convergence_tol=0.3,
              reg_epsilon=1e-3, max_it=100, cg_rtol=1e-6,
              cg_maxiter=1000, verbose=False, ops=DEFAULT_OPS,
              admm_alpha=1.0, auto_r=False,
              init: FotoState | None = None) -> FotoState:
    """Unjitted ALG2 while_loop — callable directly inside shard_map."""
    if auto_r:
        r = scale_invariant_r(rho0, rhoT, r, ops=ops)
    state = init_state(rho0, rhoT, Nt) if init is None else init

    def cond(s: FotoState):
        return (~s.done) & (s.iteration < max_it)

    def body(s: FotoState):
        return alg2_iteration(
            s, rho0, rhoT, r=r, reg_epsilon=reg_epsilon,
            convergence_tol=convergence_tol, cg_rtol=cg_rtol,
            cg_maxiter=cg_maxiter, verbose=verbose, max_it=max_it, ops=ops,
            admm_alpha=admm_alpha)

    return lax.while_loop(cond, body, state)


@partial(jax.jit, static_argnames=("Nt", "max_it", "cg_maxiter", "verbose",
                                   "ops", "admm_alpha", "auto_r"))
def solve_potential(rho0, rhoT, Nt, *, r=1.0, convergence_tol=0.3,
                    reg_epsilon=1e-3, max_it=100, cg_rtol=1e-6,
                    cg_maxiter=1000, verbose=False, ops=DEFAULT_OPS,
                    admm_alpha=1.0, auto_r=False,
                    init: FotoState | None = None) -> FotoState:
    """Run the ALG2 loop to convergence; returns the final solver state.

    Defaults mirror the reference library defaults
    (reference benamou_brenier.py:151); the CLI overrides them like
    reference main.py does.  Pass ``init`` (e.g. from a checkpoint) to
    resume a long solve.  ``admm_alpha`` != 1 enables over-relaxed ADMM
    (see :func:`alg2_iteration`); ``auto_r`` rescales the penalty to the
    data scale (see :func:`scale_invariant_r` — off by default for
    reference parity).
    """
    return alg2_loop(rho0, rhoT, Nt, r=r, convergence_tol=convergence_tol,
                     reg_epsilon=reg_epsilon, max_it=max_it, cg_rtol=cg_rtol,
                     cg_maxiter=cg_maxiter, verbose=verbose, ops=ops,
                     admm_alpha=admm_alpha, auto_r=auto_r, init=init)


@partial(jax.jit, static_argnames=("Nt", "iterations", "cg_maxiter", "ops",
                                   "admm_alpha"))
def solve_potential_with_history(rho0, rhoT, Nt, iterations, *, r=1.0,
                                 reg_epsilon=1e-3, cg_rtol=1e-6,
                                 cg_maxiter=1000, ops=DEFAULT_OPS,
                                 admm_alpha=1.0):
    """Fixed-iteration ALG2 via ``lax.scan`` returning the full convergence
    trajectory (crit and cumulative inner iterations per step) — the
    device-side convergence curve the reference only exposes as prints
    (reference benamou_brenier.py:252).  Returns (final_state, history)
    with ``history = {"crit": (iterations,), "cg": (iterations,)}``."""
    state = init_state(jnp.asarray(rho0), jnp.asarray(rhoT), Nt)

    def step(s, _):
        s = alg2_iteration(s, rho0, rhoT, r=r, reg_epsilon=reg_epsilon,
                           convergence_tol=0.0, cg_rtol=cg_rtol,
                           cg_maxiter=cg_maxiter, ops=ops,
                           admm_alpha=admm_alpha)
        return s, (s.crit, s.cg_iterations)

    state, (crits, cgs) = lax.scan(step, state, None, length=iterations)
    return state, {"crit": crits, "cg": cgs}


def kinetic_action(mu: jnp.ndarray, rho_floor: float = 1e-12) -> jnp.ndarray:
    """Discrete Benamou–Brenier kinetic action: the time-trapezoid sum of
    ``|m|^2 / rho`` over the space-time grid (dt = dx = dy = 1) — the
    objective ALG2 minimizes.  Trapezoid weights (1/2 at t = 0 and
    t = Nt-1) make the Nt-slice sum a proper quadrature of the horizon
    ``T = Nt - 1``.

    Cells with ``rho <= rho_floor`` contribute 0 — at the optimum the
    momentum vanishes wherever the density does (else the action would be
    infinite), so the floor only guards 0/0.
    """
    rho, m1, m2 = mu[0], mu[1], mu[2]
    speed2 = m1 * m1 + m2 * m2
    safe = jnp.maximum(rho, rho_floor)
    dens = jnp.where(rho > rho_floor, speed2 / safe, 0.0)
    Nt = mu.shape[-3]
    t = lax.broadcasted_iota(jnp.int32, dens.shape, dens.ndim - 3)
    w = jnp.where((t == 0) | (t == Nt - 1), 0.5, 1.0)
    return jnp.sum(w * dens)


def wasserstein2(state: FotoState) -> jnp.ndarray:
    """Quadratic Wasserstein distance W2(rho0, rhoT) from a converged ALG2
    state (net-new vs the reference, which never exposes the OT value its
    solver computes — reference benamou_brenier.py solves the problem but
    returns only the flow).

    Derivation: with the grid's unit time step the solve spans horizon
    ``T = Nt - 1``, and for a horizon-T geodesic the kinetic action is
    ``W2^2 / T`` (constant-speed reparametrization), so
    ``W2^2 = (Nt - 1) * kinetic_action / mass``.  The per-slice mass
    division makes the result the W2 between the *normalized* measures,
    in pixel units.  Exact for translations up to discretization error
    (validated in tests/test_foto.py on shifted blobs; note ALG2
    convergence needs small r there — r=0.1 transports fully where r=1
    stalls under the reference's stagnation guard).
    """
    Nt = state.mu.shape[-3]
    total_mass = jnp.sum(state.mu[0]) / Nt     # per-slice mass
    return jnp.sqrt((Nt - 1.0) * kinetic_action(state.mu) / total_mass)


def solve(rho0, rhoT, Nt, *, r=1.0, convergence_tol=0.3, reg_epsilon=1e-3,
          max_it=100, cg_rtol=1e-6, cg_maxiter=1000, verbose=False,
          ops=DEFAULT_OPS, admm_alpha=1.0, auto_r=False,
          init: FotoState | None = None) -> FotoResult:
    """Full FOTO solve: ALG2 on the potential, then flow extraction
    (trajectory integration + luminosity), mirroring the reference's
    ``benamou_brenier.solve`` -> (u, v, m) contract
    (reference benamou_brenier.py:269-271)."""
    from ofot_tpu.solvers import flow_extract  # local import to avoid cycle

    rho0 = jnp.asarray(rho0)
    rhoT = jnp.asarray(rhoT)
    state = solve_potential(
        rho0, rhoT, Nt, r=r, convergence_tol=convergence_tol,
        reg_epsilon=reg_epsilon, max_it=max_it, cg_rtol=cg_rtol,
        cg_maxiter=cg_maxiter, verbose=verbose, ops=ops,
        admm_alpha=admm_alpha, auto_r=auto_r, init=init)
    u, v, m = flow_extract.flow_from_potential(state.phi)
    return FotoResult(u=u, v=v, m=m, state=state)
