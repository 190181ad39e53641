"""Batched sweep mode == per-sequence mode (same artifacts, same flows)."""

import json

import numpy as np

from ofot_tpu.cli import pipeline
from ofot_tpu.utils import image, flo
import fixtures

FAST = "--Nt=4 --max-it=5"


def _mk_data(root, names):
    for i, name in enumerate(names):
        d = root / "middlebury-1" / "eval-data-gray" / name
        d.mkdir(parents=True)
        f1, f2 = fixtures.translating_square(20)
        if i % 2:
            f1, f2 = fixtures.smooth_blob_pair(20, 20)
        image.save_grayscale(f1, str(d / "frame10.png"))
        image.save_grayscale(f2, str(d / "frame11.png"))


def test_batch_matches_sequential(tmp_path):
    _mk_data(tmp_path / "data", ["a", "b", "c"])
    common = ["--data-root", str(tmp_path / "data"),
              "--datasets", "middlebury-1", "--platform=cpu",
              "--extra-args", FAST]
    assert pipeline.main(["run", "--results", str(tmp_path / "seq")]
                         + common) == 0
    assert pipeline.main(["run", "--batch", "--results",
                          str(tmp_path / "batch")] + common) == 0

    for name in ("a", "b", "c"):
        for algo in ("gn", "foto"):
            _, _, u1, v1 = flo.read_flo(
                str(tmp_path / "seq" / "middlebury-1" / name / f"{algo}.flo"))
            _, _, u2, v2 = flo.read_flo(
                str(tmp_path / "batch" / "middlebury-1" / name / f"{algo}.flo"))
            aepe = np.sqrt((u1 - u2) ** 2 + (v1 - v2) ** 2).mean()
            assert aepe < 1e-4, (name, algo, aepe)

    man = json.loads((tmp_path / "batch" / "manifest.json").read_text())
    assert all(v[a]["status"] == "ok" for v in man.values() for a in v)
    # per-sequence solver diagnostics recorded (batch mode would
    # otherwise hide convergence entirely)
    first = next(iter(man.values()))
    assert "crit" in first["foto"] and "iterations" in first["foto"]
    assert "inner_iterations" in first["GN"]


def test_batch_resumes_from_flags(tmp_path):
    _mk_data(tmp_path / "data", ["a"])
    argv = ["run", "--batch", "--data-root", str(tmp_path / "data"),
            "--results", str(tmp_path / "r"), "--datasets", "middlebury-1",
            "--algos", "GN", "--platform=cpu", "--extra-args", FAST]
    assert pipeline.main(argv) == 0
    flo_path = tmp_path / "r" / "middlebury-1" / "a" / "gn.flo"
    mtime = flo_path.stat().st_mtime
    assert pipeline.main(argv) == 0          # all flagged -> nothing re-run
    assert flo_path.stat().st_mtime == mtime


def test_batch_sinkhorn_matches_single(tmp_path):
    """--batch --algos sinkhorn must produce sinkhorn flows, not fall
    through to GN (VERDICT.md r2 weak #1)."""
    _mk_data(tmp_path / "data", ["a", "b"])
    common = ["--data-root", str(tmp_path / "data"),
              "--datasets", "middlebury-1", "--algos", "sinkhorn",
              "--platform=cpu", "--extra-args=--max-it=400"]
    assert pipeline.main(["run", "--results", str(tmp_path / "seq")]
                         + common) == 0
    assert pipeline.main(["run", "--batch", "--results",
                          str(tmp_path / "batch")] + common) == 0
    for name in ("a", "b"):
        _, _, u1, v1 = flo.read_flo(
            str(tmp_path / "seq" / "middlebury-1" / name / "sinkhorn.flo"))
        _, _, u2, v2 = flo.read_flo(
            str(tmp_path / "batch" / "middlebury-1" / name / "sinkhorn.flo"))
        aepe = np.sqrt((u1 - u2) ** 2 + (v1 - v2) ** 2).mean()
        assert aepe < 1e-4, (name, aepe)
    # the square pair translates by 20//6 = 3 px: a real sinkhorn flow,
    # not a silent GN fall-through
    _, _, u2, _ = flo.read_flo(
        str(tmp_path / "batch" / "middlebury-1" / "a" / "sinkhorn.flo"))
    moving = np.abs(u2) > 1.0
    assert moving.any() and abs(u2[moving].mean() - 3.0) < 1.0


def test_batch_unknown_algo_raises():
    """solve_batch_full must reject algos it has no branch for."""
    import pytest
    from ofot_tpu.parallel import sweep
    f = np.ones((1, 8, 8), np.float32)
    with pytest.raises(ValueError, match="unknown batch algo"):
        sweep.solve_batch_full("HS", f, f)


def test_batch_two_host_partition(tmp_path):
    """--batch with --host-count partitions sequences disjointly and
    writes per-host manifest shards that merge cleanly (VERDICT.md r2
    weak #3: previously both hosts solved everything and clobbered one
    manifest.json)."""
    _mk_data(tmp_path / "data", ["a", "b", "c"])
    base = ["run", "--batch", "--data-root", str(tmp_path / "data"),
            "--results", str(tmp_path / "results"),
            "--datasets", "middlebury-1", "--algos", "GN",
            "--platform=cpu", "--extra-args", FAST,
            "--host-count", "2"]
    assert pipeline.main(base + ["--host-id", "0"]) == 0
    # host 0 must not have produced host 1's sequences
    done_after_h0 = sorted(
        p.parent.name for p in
        (tmp_path / "results" / "middlebury-1").glob("*/gn.flo"))
    assert 0 < len(done_after_h0) < 3
    assert pipeline.main(base + ["--host-id", "1"]) == 0
    assert pipeline.main(["merge-manifests", "--results",
                          str(tmp_path / "results")]) == 0
    merged = json.loads(
        (tmp_path / "results" / "manifest.json").read_text())
    assert sorted(merged) == ["middlebury-1/a", "middlebury-1/b",
                              "middlebury-1/c"]
    shard0 = json.loads(
        (tmp_path / "results" / "manifest.0.json").read_text())
    shard1 = json.loads(
        (tmp_path / "results" / "manifest.1.json").read_text())
    assert not (set(shard0) & set(shard1))   # disjoint work


def test_batch_data_parallel_matches_single_device(tmp_path):
    """--data-parallel D shards the batch axis over the 'data' mesh axis
    (forced 8-device CPU mesh from conftest) — flows must match the
    unsharded batched sweep."""
    _mk_data(tmp_path / "data", ["a", "b", "c", "d"])
    common = ["--data-root", str(tmp_path / "data"),
              "--datasets", "middlebury-1", "--platform=cpu",
              "--extra-args", FAST]
    assert pipeline.main(["run", "--batch", "--results",
                          str(tmp_path / "one")] + common) == 0
    assert pipeline.main(["run", "--batch", "--data-parallel", "4",
                          "--results", str(tmp_path / "dp")] + common) == 0
    for name in ("a", "b", "c", "d"):
        for algo in ("gn", "foto"):
            _, _, u1, v1 = flo.read_flo(
                str(tmp_path / "one" / "middlebury-1" / name / f"{algo}.flo"))
            _, _, u2, v2 = flo.read_flo(
                str(tmp_path / "dp" / "middlebury-1" / name / f"{algo}.flo"))
            aepe = np.sqrt((u1 - u2) ** 2 + (v1 - v2) ** 2).mean()
            assert aepe < 1e-4, (name, algo, aepe)


def test_map_mode_bitwise_equals_single_and_vmap():
    """'map' batch mode (lax.map inside one program — VERDICT.md r4
    item 2) must reproduce the single-pair solve bitwise, for both the
    unsharded and the chunk-major data-parallel layout."""
    import jax
    import jax.numpy as jnp
    from ofot_tpu.parallel import sweep, mesh as mesh_mod
    from ofot_tpu.solvers import foto, gn
    from ofot_tpu.solvers import flow_extract

    pairs = [fixtures.smooth_blob_pair(24, 28, shift=(2.0, 1.0)),
             fixtures.smooth_blob_pair(24, 28, shift=(-1.0, 2.0)),
             fixtures.smooth_blob_pair(24, 28, shift=(1.5, 0.0)),
             fixtures.smooth_blob_pair(24, 28, shift=(0.5, -1.5))]
    f1s = np.stack([np.asarray(a, np.float32) for a, _ in pairs])
    f2s = np.stack([np.asarray(b, np.float32) for _, b in pairs])

    for algo, params in (("foto", {"foto_params": {
                              "Nt": 4, "max_it": 6,
                              "stepA_solver": "dct"}}),
                         ("GN", {"gn_params": {}})):
        um, vm, mm, dm = sweep.solve_batch_full(algo, f1s, f2s, None,
                                                batch_mode="map", **params)
        uv, vv, mv, dv = sweep.solve_batch_full(algo, f1s, f2s, None,
                                                batch_mode="vmap", **params)
        mesh = mesh_mod.make_mesh({"data": 2})
        ud, vd, md, dd = sweep.solve_batch_full(algo, f1s, f2s, mesh,
                                                batch_mode="map", **params)
        # single-pair truth, solved one by one
        for i in range(4):
            a, b = jnp.asarray(f1s[i]), jnp.asarray(f2s[i])
            if algo == "foto":
                st = jax.jit(lambda p, q: foto.solve_potential(
                    p, q, 4, max_it=6,
                    ops=foto.stepA_ops("dct")))(a, b)
                u1, v1, _ = flow_extract.flow_from_potential(st.phi)
            else:
                r = jax.jit(lambda p, q: gn.solve_fields(p, q, 0.1, 0.2))(
                    a, b)
                u1, v1 = r.u, r.v
            if algo == "foto":
                # the iterative solver reproduces the single-pair trace
                # bitwise inside lax.map and inside shard_map(lax.map)
                assert np.array_equal(np.asarray(um[i]), np.asarray(u1)), \
                    (algo, i, "map vs single")
                assert np.array_equal(np.asarray(vm[i]), np.asarray(v1))
                assert np.array_equal(np.asarray(ud[i]), np.asarray(um[i])), \
                    (algo, i, "dp-map vs map")
            else:
                # GN's dense spectral solve refuses bitwise stability
                # across program embeddings (XLA refuses identical
                # fusion inside scan) — hold it to last-ulp agreement
                for got, want in ((um[i], u1), (vm[i], v1), (ud[i], um[i])):
                    assert np.allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-6, rtol=1e-6), (algo, i)
        # vmap stays available and agrees to float tolerance
        aepe = np.sqrt((np.asarray(um) - np.asarray(uv)) ** 2
                       + (np.asarray(vm) - np.asarray(vv)) ** 2).mean()
        assert aepe < 1e-4, (algo, aepe)


def test_batch_sinkhorn_exact_stabilizer():
    """The exactly-stabilized softmin composes with both batch
    executions and the data mesh (lax.map / shard_map of lax.map /
    vmap all trace _exact_stats' chunked lax.map internally)."""
    import numpy as np
    from ofot_tpu.parallel import sweep, mesh as mesh_mod

    pairs = [fixtures.smooth_blob_pair(24, 28, shift=(2.0, 1.0)),
             fixtures.smooth_blob_pair(24, 28, shift=(0.0, 1.5))]
    f1s = np.stack([np.asarray(a, np.float32) for a, _ in pairs])
    f2s = np.stack([np.asarray(b, np.float32) for _, b in pairs])
    sp = dict(epsilon=4.0, max_iter=200, tol=1e-4, stabilizer="exact")
    outs = {}
    for mode in ("map", "vmap"):
        u, v, m, d = sweep.solve_batch_full(
            "sinkhorn", f1s, f2s, mesh_mod.make_mesh({"data": 2}),
            sinkhorn_params=sp, batch_mode=mode)
        assert np.asarray(d["marginal_error"]).max() <= 1e-4
        outs[mode] = np.asarray(u)
    assert np.allclose(outs["map"], outs["vmap"], atol=1e-4)
    import pytest as _pt
    with _pt.raises(ValueError, match="stabilizer"):
        sweep.solve_batch_full("sinkhorn", f1s, f2s, None,
                               sinkhorn_params=dict(stabilizer="auto"))
