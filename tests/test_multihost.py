"""Multi-host scaffolding: deterministic partitioning + manifest merge +
two-'host' pipeline sweep on one machine."""

import json

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
