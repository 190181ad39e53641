"""Observability helpers."""

import json

from ofot_tpu.utils.trace import JsonlLogger, annotate, profile


def test_jsonl_logger(tmp_path):
    p = tmp_path / "log.jsonl"
    log = JsonlLogger(str(p))
    log.log("solve", algo="foto", wall_s=1.5)
    log.log("solve", algo="GN", wall_s=0.1)
    recs = [json.loads(l) for l in p.read_text().splitlines()]
    assert len(recs) == 2
    assert recs[0]["algo"] == "foto" and "ts" in recs[0]


def test_jsonl_logger_noop():
    JsonlLogger(None).log("x", a=1)     # must not raise or write


def test_annotate_and_profile_smoke(tmp_path):
    import jax.numpy as jnp
    with profile(None):                  # no-op path
        pass
    with annotate("stepA"):
        jnp.ones(4).sum()
