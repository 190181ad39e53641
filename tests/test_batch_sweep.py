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
