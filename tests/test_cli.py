"""CLI end-to-end tests (in-process, CPU) incl. parity vs the reference CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

from ofot_tpu.cli import main as cli_main
from ofot_tpu.utils import image, flo
import fixtures

REF = "/root/reference"


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    f1, f2 = fixtures.translating_square(24)
    image.save_grayscale(f1, str(d / "f0.png"))
    image.save_grayscale(f2, str(d / "f1.png"))
    return d


def _run(frames, tmp_path, *extra):
    argv = [str(frames / "f0.png"), str(frames / "f1.png"),
            "--platform=cpu", "--quiet"] + list(extra)
    return cli_main.main(argv)


def test_gn_writes_all_artifacts(frames, tmp_path):
    rc = _run(frames, tmp_path, "--algo=GN", "--lambda=0.2",
              f"--out={tmp_path}/gn.flo",
              f"--save-benchmark={tmp_path}/b.txt",
              f"--save-reconstruction={tmp_path}/r.png",
              f"--save-lum={tmp_path}/l.png",
              f"--save-flow-viz={tmp_path}/viz.png")
    assert rc == 0
    for name in ("gn.flo", "b.txt", "r.png", "l.png", "viz.png"):
        assert (tmp_path / name).exists(), name
    txt = (tmp_path / "b.txt").read_text()
    assert txt.startswith("IE: ") and "time: " in txt


def test_unknown_algo_fails(frames, tmp_path, capsys):
    rc = _run(frames, tmp_path, "--algo=bogus")
    assert rc == 2


def test_wfr_writes_artifacts(frames, tmp_path):
    rc = _run(frames, tmp_path, "--algo=WFR", "--Nt=4", "--max-it=10",
              "--r=0.5", "--wfr-delta=15", "--reg-epsilon=1e-2",
              f"--out={tmp_path}/wfr.flo",
              f"--save-growth={tmp_path}/g.png",
              f"--log-jsonl={tmp_path}/log.jsonl")
    assert rc == 0
    for name in ("wfr.flo", "g.png", "log.jsonl"):
        assert (tmp_path / name).exists(), name
    import json
    rec = json.loads((tmp_path / "log.jsonl").read_text().splitlines()[-1])
    assert "wfr_distance" in rec and "created_mass" in rec


def test_sinkhorn_writes_artifacts(frames, tmp_path):
    rc = _run(frames, tmp_path, "--algo=sinkhorn", "--max-it=500",
              "--sinkhorn-epsilon=4.0", "--normalize",
              f"--out={tmp_path}/sk.flo",
              f"--save-benchmark={tmp_path}/b.txt",
              f"--log-jsonl={tmp_path}/log.jsonl")
    assert rc == 0
    w, h, u, v = flo.read_flo(str(tmp_path / "sk.flo"))
    assert (w, h) == (24, 24)
    assert np.isfinite(u).all() and np.isfinite(v).all()
    # the square translates by n//6 = (4, 4) (fixtures.translating_square);
    # the plan's barycentric map must move its mass accordingly
    moving = np.abs(u) > 0.5
    assert moving.any(), "solver regressed to near-zero flow"
    assert abs(u[moving].mean() - 4.0) < 0.5
    import json
    rec = json.loads((tmp_path / "log.jsonl").read_text().splitlines()[-1])
    assert "marginal_error" in rec and "wasserstein2" in rec


def test_sinkhorn_f32_envelope_warning(frames, tmp_path, capsys):
    """eps below the matmul softmin's f32 envelope (eps >= 3,
    solvers/sinkhorn.py docstring) warns only when the user PINS the
    matmul stabilizer — under the default auto policy the final-marginal
    verification + exact re-solve handle the regime (round 5), so a
    blanket warning would be noise; f64 runs are inside the envelope and
    must not warn either (VERDICT.md r2 weak #8)."""
    rc = _run(frames, tmp_path, "--algo=sinkhorn", "--max-it=100",
              "--sinkhorn-epsilon=1.0", "--sinkhorn-stabilizer=matmul")
    assert rc == 0
    assert "f32 envelope" in capsys.readouterr().err
    rc = _run(frames, tmp_path, "--algo=sinkhorn", "--max-it=100",
              "--sinkhorn-epsilon=1.0")           # auto: no warning
    assert rc == 0
    assert "envelope" not in capsys.readouterr().err
    rc = _run(frames, tmp_path, "--algo=sinkhorn", "--max-it=100",
              "--sinkhorn-epsilon=1.0", "--precision=f64")
    assert rc == 0
    assert "envelope" not in capsys.readouterr().err


def test_sinkhorn_max_iter_warning(frames, tmp_path, capsys):
    """A max_iter exit (marginal_error > tol) is surfaced on stderr, not
    buried in solver_stats (ADVICE.md r2)."""
    rc = _run(frames, tmp_path, "--algo=sinkhorn", "--max-it=2",
              "--sinkhorn-tol=1e-12")
    assert rc == 0
    err = capsys.readouterr().err
    assert "marginal error" in err and "--max-it" in err


def test_ground_truth_metrics(frames, tmp_path):
    # synthetic GT: constant (4, 4) flow
    w = h = 24
    flo.write_flo(w, h, np.full(w * h, 4.0), np.full(w * h, 4.0),
                  str(tmp_path / "gt.flo"))
    rc = _run(frames, tmp_path, "--algo=foto", "--Nt=4", "--max-it=8",
              "--convergence-tol=0.1", "--reg-epsilon=1e-2",
              f"--ground-truth={tmp_path}/gt.flo",
              f"--save-benchmark={tmp_path}/b.txt")
    assert rc == 0
    txt = (tmp_path / "b.txt").read_text()
    assert txt.startswith("EE-mean: ")
    assert "AE-stddev:" in txt and "IE:" in txt


def test_checkpoint_resume(frames, tmp_path):
    rc = _run(frames, tmp_path, "--algo=foto", "--Nt=4", "--max-it=3",
              "--convergence-tol=1e-9", "--reg-epsilon=1e-2",
              f"--checkpoint={tmp_path}/ck")
    assert rc == 0
    assert (tmp_path / "ck.npz").exists()
    rc = _run(frames, tmp_path, "--algo=foto", "--Nt=4", "--max-it=6",
              "--convergence-tol=1e-9", "--reg-epsilon=1e-2",
              f"--resume={tmp_path}/ck", f"--out={tmp_path}/resumed.flo")
    assert rc == 0
    assert (tmp_path / "resumed.flo").exists()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("algo_args", [
    ["--algo=GN", "--alpha=0.1", "--lambda=0.2"],
    ["--algo=foto", "--r=1", "--convergence-tol=0.1", "--reg-epsilon=1e-2",
     "--Nt=4", "--max-it=10"],
])
def test_parity_vs_reference_cli(frames, tmp_path, algo_args):
    """Same inputs through both CLIs -> same IE (rtol 1e-4) and AEPE
    between the .flo outputs < 0.01."""
    ours_flo = tmp_path / "ours.flo"
    ref_flo = tmp_path / "ref.flo"
    ours_b = tmp_path / "ours.txt"
    ref_b = tmp_path / "ref.txt"

    rc = _run(frames, tmp_path, *algo_args, f"--out={ours_flo}",
              f"--save-benchmark={ours_b}", "--precision=f64")
    assert rc == 0

    r = subprocess.run(
        [sys.executable, "main.py", str(frames / "f0.png"),
         str(frames / "f1.png"), f"--out={ref_flo}",
         f"--save-benchmark={ref_b}"] + algo_args,
        cwd=REF, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    def ie_of(p):
        return float(p.read_text().splitlines()[-2].split("IE: ")[1])

    ie_ours = float([l for l in ours_b.read_text().splitlines()
                     if l.startswith("IE")][0].split(": ")[1])
    ie_ref = float([l for l in ref_b.read_text().splitlines()
                    if l.startswith("IE")][0].split(": ")[1])
    np.testing.assert_allclose(ie_ours, ie_ref, rtol=1e-4)

    _, _, u1, v1 = flo.read_flo(str(ours_flo))
    _, _, u2, v2 = flo.read_flo(str(ref_flo))
    aepe = np.sqrt((u1 - u2) ** 2 + (v1 - v2) ** 2).mean()
    assert aepe < 0.01, aepe


@pytest.mark.parametrize("solver", ["dct-fused", "cg-pallas"])
def test_experimental_stepA_backends_match_dct(frames, tmp_path, solver):
    """The round-4 experimental backends (--stepA-solver=dct-fused /
    cg-pallas) produce the same flow as the spectral default through the
    full CLI path (CPU interpret mode for the Pallas kernels)."""
    for name, flags in (("ref", ["--stepA-solver=dct"]),
                        ("exp", [f"--stepA-solver={solver}"])):
        rc = _run(frames, tmp_path, "--algo=foto", "--Nt=4",
                  "--max-it=8", "--convergence-tol=0.0",
                  "--reg-epsilon=1e-2",
                  f"--out={tmp_path}/{name}.flo", *flags)
        assert rc == 0
    _, _, u1, v1 = flo.read_flo(f"{tmp_path}/ref.flo")
    _, _, u2, v2 = flo.read_flo(f"{tmp_path}/exp.flo")
    aepe = float(np.sqrt((u1 - u2) ** 2 + (v1 - v2) ** 2).mean())
    assert aepe < 1e-3, aepe
