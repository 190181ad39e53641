"""Pipeline sweep tests: artifacts, resume flags, middlebury-2 GT path."""

import json

import numpy as np
import pytest

from ofot_tpu.cli import pipeline
from ofot_tpu.utils import image, flo
import fixtures

FAST = ["--Nt=4", "--max-it=4"]


def _mk_mb1(root, n_seq=1):
    for i in range(n_seq):
        d = root / "middlebury-1" / "eval-data-gray" / f"seq{i}"
        d.mkdir(parents=True)
        f1, f2 = fixtures.translating_square(18 + 6 * i)
        image.save_grayscale(f1, str(d / "frame10.png"))
        image.save_grayscale(f2, str(d / "frame11.png"))


def _mk_mb2(root):
    d = root / "middlebury-2" / "other-data-gray" / "GTSeq"
    d.mkdir(parents=True)
    f1, f2 = fixtures.smooth_blob_pair(18, 20)
    image.save_grayscale(f1, str(d / "frame10.png"))
    image.save_grayscale(f2, str(d / "frame11.png"))
    g = root / "middlebury-2" / "other-gt-flow" / "GTSeq"
    g.mkdir(parents=True)
    flo.write_flo(20, 18, np.full(360, 1.0), np.full(360, 2.0),
                  str(g / "flow10.flo"))


def test_sweep_artifacts_and_resume(tmp_path):
    _mk_mb1(tmp_path / "data")
    args = ["run", "--data-root", str(tmp_path / "data"),
            "--results", str(tmp_path / "results"),
            "--datasets", "middlebury-1", "--platform=cpu",
            "--extra-args", " ".join(FAST)]
    assert pipeline.main(args) == 0
    seq = tmp_path / "results" / "middlebury-1" / "seq0"
    for f in ("diff.png", "gn.flo", "gn.benchmark.txt", "gn.rec.png",
              "gn.lum.png", "gn.png", "foto.flo", "foto.png",
              ".out.gn.sucess", ".out.foto.sucess"):
        assert (seq / f).exists(), f
    manifest = json.loads((tmp_path / "results" / "manifest.json").read_text())
    assert manifest["middlebury-1/seq0"]["GN"]["status"] == "ok"

    # second run resumes from flags
    assert pipeline.main(args) == 0
    manifest = json.loads((tmp_path / "results" / "manifest.json").read_text())
    assert manifest["middlebury-1/seq0"]["GN"]["status"] == "cached"


def test_middlebury2_ground_truth_path(tmp_path):
    _mk_mb2(tmp_path / "data")
    args = ["run", "--data-root", str(tmp_path / "data"),
            "--results", str(tmp_path / "results"),
            "--datasets", "middlebury-2", "--algos", "GN",
            "--platform=cpu", "--extra-args", " ".join(FAST)]
    assert pipeline.main(args) == 0
    seq = tmp_path / "results" / "middlebury-2" / "GTSeq"
    assert (seq / "flow10.png").exists()        # GT visualization
    txt = (seq / "gn.benchmark.txt").read_text()
    assert txt.startswith("EE-mean: ")           # GT metrics present
    assert "AE-mean:" in txt
