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
    # per-sequence solver diagnostics folded in from --log-jsonl (round 3)
    assert manifest["middlebury-1/seq0"]["GN"]["inner_iterations"] > 0
    assert manifest["middlebury-1/seq0"]["foto"]["iterations"] > 0
    assert "crit" in manifest["middlebury-1/seq0"]["foto"]

    # second run resumes from flags and must NOT clobber the original
    # entry's status/wall_s with a bare "cached" record
    wall = manifest["middlebury-1/seq0"]["GN"]["wall_s"]
    assert pipeline.main(args) == 0
    manifest = json.loads((tmp_path / "results" / "manifest.json").read_text())
    assert manifest["middlebury-1/seq0"]["GN"]["status"] == "ok"
    assert manifest["middlebury-1/seq0"]["GN"]["wall_s"] == wall


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


def test_wfr_sweep(tmp_path):
    """--algos WFR runs the unbalanced solver over the sweep with its own
    artifacts (growth map) and flag file, per-sequence and batched."""
    _mk_mb1(tmp_path / "data")
    args = ["run", "--data-root", str(tmp_path / "data"),
            "--results", str(tmp_path / "results"),
            "--datasets", "middlebury-1", "--algos", "WFR",
            "--platform=cpu", "--extra-args",
            " ".join(FAST + ["--wfr-delta=15"])]
    assert pipeline.main(args) == 0
    seq = tmp_path / "results" / "middlebury-1" / "seq0"
    for f in ("wfr.flo", "wfr.benchmark.txt", "wfr.growth.png", "wfr.png",
              ".out.wfr.sucess"):
        assert (seq / f).exists(), f

    batch = ["run", "--batch", "--data-root", str(tmp_path / "data"),
             "--results", str(tmp_path / "results-b"),
             "--datasets", "middlebury-1", "--algos", "WFR",
             "--platform=cpu", "--extra-args",
             " ".join(FAST + ["--wfr-delta=15"])]
    assert pipeline.main(batch) == 0
    seqb = tmp_path / "results-b" / "middlebury-1" / "seq0"
    assert (seqb / "wfr.flo").exists()


def test_unknown_algo_rejected(tmp_path):
    _mk_mb1(tmp_path / "data")
    args = ["run", "--data-root", str(tmp_path / "data"),
            "--results", str(tmp_path / "results"),
            "--datasets", "middlebury-1", "--algos", "HS",
            "--platform=cpu"]
    with pytest.raises(SystemExit):
        pipeline.main(args)


def test_batched_params_prefix_matching():
    """--lambda must reach lambdaa like argparse prefix matching does on
    the per-sequence path (SURVEY.md quirk 4); ambiguous/unknown overrides
    fail loudly instead of being silently dropped (VERDICT.md r2)."""
    fp, gp, wp, sp, _ = pipeline._batched_params(
        "--lambda=0.4 --conv=0.2 --wfr-delta=15 --auto-r "
        "--sinkhorn-eps=2.5 --max-it=50")
    assert gp["lambda_"] == 0.4
    assert fp["convergence_tol"] == 0.2
    assert wp["delta"] == 15.0
    assert wp["convergence_tol"] == 0.2   # foto solve knobs flow to WFR
    assert fp["auto_r"] is True and wp["auto_r"] is True
    assert sp["epsilon"] == 2.5
    assert sp["max_iter"] == 50           # shared iteration budget
    # valued --platform/--precision are surfaced for cmd_run_batch to
    # apply process-wide, not silently dropped (review findings, round 3)
    fp2, _, _, _, pv = pipeline._batched_params(
        "--precision=f64 --max-it=400")
    assert fp2["max_it"] == 400
    assert pv == {"precision": "f64"}
    assert pipeline._batched_params("--platform=cpu")[4] == \
        {"platform": "cpu"}
    with pytest.raises(SystemExit):       # "--p" ambiguous passthrough
        pipeline._batched_params("--p=f64")
    with pytest.raises(SystemExit):       # "--a" ambiguous (alpha/admm-alpha)
        pipeline._batched_params("--a=9")
    with pytest.raises(SystemExit):       # unknown override
        pipeline._batched_params("--bogus=1")
    with pytest.raises(SystemExit):       # unsupported store_true flag
        pipeline._batched_params("--normalize")


def test_batch_mode_ground_truth_metrics(tmp_path):
    """Batched sweep writes the same GT artifacts as the per-sequence
    path: flow10.png and EE/AE lines in benchmark.txt."""
    _mk_mb2(tmp_path / "data")
    args = ["run", "--batch", "--data-root", str(tmp_path / "data"),
            "--results", str(tmp_path / "results"),
            "--datasets", "middlebury-2", "--algos", "GN",
            "--platform=cpu"]
    assert pipeline.main(args) == 0
    seq = tmp_path / "results" / "middlebury-2" / "GTSeq"
    assert (seq / "flow10.png").exists()
    txt = (seq / "gn.benchmark.txt").read_text()
    assert txt.startswith("EE-mean: ")
    assert "AE-mean:" in txt and "IE:" in txt


def test_data_diff_identical_frames(tmp_path):
    """Static scenes (f1 == f2) must render mid-gray, not NaN garbage."""
    from ofot_tpu.cli import data_diff
    from ofot_tpu.utils import image as img
    f, _ = fixtures.translating_square(16)
    img.save_grayscale(f, str(tmp_path / "a.png"))
    img.save_grayscale(f, str(tmp_path / "b.png"))
    assert data_diff.main([str(tmp_path / "a.png"), str(tmp_path / "b.png"),
                           str(tmp_path / "d.png")]) == 0
    d, w, h = img.open_grayscale(str(tmp_path / "d.png"))
    assert np.all(np.isfinite(d))
    assert np.allclose(d, d.ravel()[0])       # uniform gray


def test_sinkhorn_tol_parsing():
    assert pipeline._sinkhorn_tol(["--algo=sinkhorn"]) == 1e-4
    assert pipeline._sinkhorn_tol(["--sinkhorn-tol=0.01"]) == 0.01
    # last occurrence wins, like argparse
    assert pipeline._sinkhorn_tol(["--sinkhorn-tol=0.01",
                                   "--sinkhorn-tol=1e-6"]) == 1e-6


def test_escalation_skips_converged_and_f64(monkeypatch):
    calls = []
    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_f64",
                        lambda argv: calls.append(argv) or True)
    # converged: no escalation
    res = {"marginal_error": 5e-5}
    pipeline._maybe_escalate_sinkhorn(res, ["--algo=sinkhorn"],
                                      __import__("pathlib").Path("x"), 1.0)
    assert not calls and "escalated_f64" not in res
    # already f64: no escalation even above tol
    res = {"marginal_error": 0.1}
    pipeline._maybe_escalate_sinkhorn(
        res, ["--algo=sinkhorn", "--precision=f64"],
        __import__("pathlib").Path("x"), 1.0)
    assert not calls and "escalated_f64" not in res


def test_escalation_triggers_above_tol(monkeypatch, tmp_path):
    stats = tmp_path / "s.jsonl"
    stats.write_text(json.dumps({"event": "solve",
                                 "marginal_error": 7e-5,
                                 "iterations": 333}) + "\n")
    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_f64",
                        lambda argv: True)
    res = {"marginal_error": 0.05, "wall_s": 1.0}
    pipeline._maybe_escalate_sinkhorn(res, ["--algo=sinkhorn"], stats, 1.0)
    assert res["escalated_f64"] is True
    assert res["marginal_error_f32"] == 0.05
    assert res["marginal_error"] == 7e-5      # re-folded from stats
    assert res["iterations"] == 333


def test_escalation_failure_marked(monkeypatch, tmp_path):
    """A failed f64 escalation must leave a marker in the manifest entry
    so sweep summaries can surface sequences shipped on the f32 floor
    (ADVICE.md r4)."""
    stats = tmp_path / "s.jsonl"
    stats.write_text(json.dumps({"event": "solve",
                                 "marginal_error": 0.05}) + "\n")
    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_f64",
                        lambda argv: False)
    res = {"marginal_error": 0.05, "wall_s": 1.0}
    pipeline._maybe_escalate_sinkhorn(res, ["--algo=sinkhorn"], stats, 1.0)
    assert res["escalation_failed"] is True
    assert "escalated_f64" not in res


def test_batch_escalation_tries_exact_in_process_first(monkeypatch,
                                                      tmp_path):
    """Batch-mode rung 1 (round 5): a flagged batch solve re-runs
    per-sequence IN PROCESS (the CLI's auto stabilizer) before any f64
    subprocess; if the re-fold shows convergence the f64 rung is never
    reached."""
    stats = tmp_path / "s.jsonl"
    stats.write_text(json.dumps({"event": "solve",
                                 "marginal_error": 8e-5,
                                 "stabilizer": "exact",
                                 "iterations": 325}) + "\n")
    calls = []
    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_inprocess",
                        lambda argv: calls.append("exact") or True)
    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_f64",
                        lambda argv: calls.append("f64") or True)
    res = {"marginal_error": 0.12, "wall_s": 1.0, "batched": True}
    pipeline._maybe_escalate_sinkhorn(res, ["--algo=sinkhorn"], stats, 1.0)
    assert calls == ["exact"]
    assert res["escalated_exact"] is True
    assert res["marginal_error_batch"] == 0.12
    assert res["marginal_error"] == 8e-5
    assert res["stabilizer"] == "exact"
    assert "escalated_f64" not in res


def test_batch_escalation_exact_miss_falls_to_f64(monkeypatch,
                                                  tmp_path):
    """Rung 1 that runs but MISSES tol must not claim escalated_exact;
    it records marginal_error_exact and falls through to the f64 rung
    (review, round 5)."""
    stats = tmp_path / "s.jsonl"
    stats.write_text(json.dumps({"event": "solve",
                                 "marginal_error": 5e-4}) + "\n")
    calls = []

    def fake_exact(argv):
        calls.append("exact")
        return True                    # rc 0, but still above tol

    def fake_f64(argv):
        calls.append("f64")
        stats.write_text(json.dumps({"event": "solve",
                                     "marginal_error": 8e-5}) + "\n")
        return True

    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_inprocess",
                        fake_exact)
    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_f64", fake_f64)
    res = {"marginal_error": 0.12, "wall_s": 1.0, "batched": True}
    pipeline._maybe_escalate_sinkhorn(res, ["--algo=sinkhorn"], stats, 1.0)
    assert calls == ["exact", "f64"]
    assert "escalated_exact" not in res
    assert res["marginal_error_exact"] == 5e-4
    assert res["escalated_f64"] is True
    assert res["marginal_error"] == 8e-5


def test_batch_escalation_skips_rung1_when_exact_pinned(monkeypatch,
                                                        tmp_path):
    """A batch that already ran with a pinned exact stabilizer must not
    waste rung 1 on an identical re-solve (review, round 5)."""
    stats = tmp_path / "s.jsonl"
    stats.write_text(json.dumps({"event": "solve",
                                 "marginal_error": 9e-5}) + "\n")
    calls = []
    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_inprocess",
                        lambda argv: calls.append("exact") or True)
    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_f64",
                        lambda argv: calls.append("f64") or True)
    res = {"marginal_error": 5e-4, "wall_s": 1.0, "batched": True}
    pipeline._maybe_escalate_sinkhorn(
        res, ["--algo=sinkhorn", "--sinkhorn-stabilizer=exact"],
        stats, 1.0)
    assert calls == ["f64"]


def test_escalation_triggers_on_nan(monkeypatch, tmp_path):
    """A diverged (NaN) marginal error must escalate too — `me <= tol`
    is False for NaN by IEEE semantics."""
    stats = tmp_path / "s.jsonl"
    stats.write_text(json.dumps({"event": "solve",
                                 "marginal_error": 9e-5}) + "\n")
    monkeypatch.setattr(pipeline, "_escalate_sinkhorn_f64",
                        lambda argv: True)
    res = {"marginal_error": float("nan")}
    pipeline._maybe_escalate_sinkhorn(res, ["--algo=sinkhorn"], stats, 1.0)
    assert res["escalated_f64"] is True


def test_batch_interrupted_escalation_not_marked_done(tmp_path, monkeypatch):
    """If the f64 escalation is interrupted mid-run (killed subprocess /
    Ctrl-C), the .sucess resume flag must NOT exist — a flag touched
    before escalation would permanently ship the biased f32 flow
    (review, round 4).  A re-run must then redo the sequence."""
    _mk_mb1(tmp_path / "data")

    class _Boom(BaseException):
        pass

    def boom(res, argv, stats_path, wall0):
        raise _Boom()

    monkeypatch.setattr(pipeline, "_maybe_escalate_sinkhorn", boom)
    args = ["run", "--batch", "--data-root", str(tmp_path / "data"),
            "--results", str(tmp_path / "results"),
            "--datasets", "middlebury-1", "--algos", "sinkhorn",
            "--platform=cpu",
            "--extra-args", "--max-it=10 --sinkhorn-epsilon=8"]
    with pytest.raises(_Boom):
        pipeline.main(args)
    seq = tmp_path / "results" / "middlebury-1" / "seq0"
    assert not (seq / ".out.sinkhorn.sucess").exists()

    # with escalation restored (no-op: below-tol short-circuit bypassed by
    # returning directly), the re-run completes and flags the sequence
    monkeypatch.setattr(pipeline, "_maybe_escalate_sinkhorn",
                        lambda res, argv, stats_path, wall0: None)
    assert pipeline.main(args) == 0
    assert (seq / ".out.sinkhorn.sucess").exists()
