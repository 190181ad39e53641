"""Multi-host scaffolding: deterministic partitioning + manifest merge +
two-'host' pipeline sweep on one machine + the REAL two-process
``jax.distributed.initialize`` path (coordinator-connected subprocesses,
cross-process Gloo collectives — VERDICT.md r4 item 1)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from ofot_tpu.parallel import multihost
from ofot_tpu.cli import pipeline
from ofot_tpu.utils import image
import fixtures


def test_partition_disjoint_and_complete():
    keys = [f"seq{i}" for i in range(7)]
    parts = [multihost.partition_keys(keys, i, 3) for i in range(3)]
    flat = sorted(k for p in parts for k in p)
    assert flat == sorted(keys)
    assert all(len(set(p)) == len(p) for p in parts)


def test_initialize_single_host():
    pid, count = multihost.initialize()
    assert pid == 0 and count >= 1


def test_two_host_sweep_and_merge(tmp_path):
    # 3 sequences, swept by two "hosts" (same machine, disjoint sets)
    for i in range(3):
        d = tmp_path / "data" / "middlebury-1" / "eval-data-gray" / f"s{i}"
        d.mkdir(parents=True)
        f1, f2 = fixtures.translating_square(18)
        image.save_grayscale(f1, str(d / "frame10.png"))
        image.save_grayscale(f2, str(d / "frame11.png"))

    base = ["run", "--data-root", str(tmp_path / "data"),
            "--results", str(tmp_path / "results"),
            "--datasets", "middlebury-1", "--algos", "GN",
            "--platform=cpu", "--host-count", "2"]
    assert pipeline.main(base + ["--host-id", "0"]) == 0
    assert pipeline.main(base + ["--host-id", "1"]) == 0
    assert pipeline.main(["merge-manifests", "--results",
                          str(tmp_path / "results")]) == 0

    merged = json.loads((tmp_path / "results" / "manifest.json").read_text())
    assert sorted(merged) == ["middlebury-1/s0", "middlebury-1/s1",
                              "middlebury-1/s2"]
    for v in merged.values():
        assert v["GN"]["status"] == "ok"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_real_two_process_distributed(tmp_path):
    """Spawn two coordinator-connected CPU processes (4 virtual devices
    each) and assert: process_count==2, an 8-device cross-process psum,
    a GSPMD FOTO solve whose sharded-state fingerprint is bitwise-equal
    across the two processes AND matches this (single-process, 8-device)
    process's own GSPMD solve, and a host-partitioned sweep whose
    manifest shards merge to full coverage."""
    try:
        port = _free_port()
    except OSError as e:                       # no localhost sockets here
        pytest.skip(f"cannot bind localhost sockets: {e}")

    for i in range(3):
        d = tmp_path / "data" / "middlebury-1" / "eval-data-gray" / f"s{i}"
        d.mkdir(parents=True)
        f1, f2 = fixtures.translating_square(18)
        image.save_grayscale(f1, str(d / "frame10.png"))
        image.save_grayscale(f2, str(d / "frame11.png"))

    repo_root = str(Path(__file__).resolve().parents[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)             # the worker forces cpu itself
    outs = [tmp_path / f"host{i}.json" for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, "-m", "ofot_tpu.parallel.multihost_worker",
         "--coordinator", f"localhost:{port}",
         "--process-id", str(i), "--num-processes", "2",
         "--local-devices", "4", "--out", str(outs[i]),
         "--data-root", str(tmp_path / "data"),
         "--results", str(tmp_path / "results"),
         "--checkpoint-dir", str(tmp_path / "ckpt")],
        env=env, cwd=repo_root, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host workers timed out")
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    res = [json.loads(o.read_text()) for o in outs]
    for r in res:
        assert r["process_count"] == 2
        assert r["global_devices"] == 8
        assert r["psum"] == r["psum_expected"] == 28.0
        assert r["sweep_rc"] == 0
    # the two processes computed ONE global solve: identical diagnostics
    # — and the distributed Orbax round-trip (every process saving its
    # own shards, restoring onto the global mesh) reproduces it exactly
    for r in res:
        assert r["ckpt_phi_l1"] == r["foto_phi_l1"]
        assert r["ckpt_iteration"] == r["foto_iterations"]
    assert res[0]["foto_crit"] == res[1]["foto_crit"]
    assert res[0]["foto_phi_l1"] == res[1]["foto_phi_l1"]
    assert res[0]["foto_iterations"] == res[1]["foto_iterations"] > 0

    # cross-process GSPMD == this process's single-process 8-device GSPMD
    import jax
    import jax.numpy as jnp
    from ofot_tpu.parallel import gspmd, mesh as mesh_mod
    from ofot_tpu.parallel.multihost_worker import _smooth_pair

    m = mesh_mod.spatial_mesh(2, 4)
    rho0, rhoT = _smooth_pair(48, 64)
    st = gspmd.solve_foto_sharded(
        jnp.asarray(rho0, jnp.float32), jnp.asarray(rhoT, jnp.float32),
        6, m, max_it=40)
    assert float(st.crit) == pytest.approx(res[0]["foto_crit"], rel=1e-5)
    l1 = float(jax.jit(lambda a: jnp.sum(jnp.abs(a)))(st.phi))
    assert l1 == pytest.approx(res[0]["foto_phi_l1"], rel=1e-5)

    # the two real processes' manifest shards merge to full coverage
    assert pipeline.main(["merge-manifests", "--results",
                          str(tmp_path / "results")]) == 0
    merged = json.loads((tmp_path / "results" / "manifest.json").read_text())
    assert sorted(merged) == ["middlebury-1/s0", "middlebury-1/s1",
                              "middlebury-1/s2"]
    shard_keys = [json.loads((tmp_path / "results" / f"manifest.{i}.json")
                             .read_text()).keys() for i in range(2)]
    assert not (set(shard_keys[0]) & set(shard_keys[1]))
    for v in merged.values():
        assert v["GN"]["status"] == "ok"
