"""Tracing / profiling / structured logging helpers.

The reference's only observability is a wall-clock timer and per-iteration
criterion prints (SURVEY.md §5).  Here:

  * ``profile(dir)`` — context manager around ``jax.profiler`` traces;
  * ``annotate(name)`` — TraceAnnotation for marking solver phases
    (stepA/stepB/stepC show up on the TPU timeline);
  * ``JsonlLogger`` — append-only structured event log used by the CLI
    (``--log-jsonl``) and the sweep pipeline.
"""

from __future__ import annotations

import contextlib
import json
import time


@contextlib.contextmanager
def profile(trace_dir: str | None):
    import jax
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class JsonlLogger:
    """Append structured events to a JSONL file (no-op when path is None)."""

    def __init__(self, path: str | None):
        self.path = path

    def log(self, event: str, **fields) -> None:
        if not self.path:
            return
        rec = {"ts": time.time(), "event": event, **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
