"""Persistent XLA compilation cache setup.

Remote TPU compiles in this environment cost minutes; the on-disk cache
makes repeat invocations (CLI runs, benchmark re-runs, sweep restarts)
skip them entirely.  Safe to call multiple times; failures are non-fatal
(the cache is an optimization, never a requirement).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OFOT_COMPILE_CACHE",
        os.path.expanduser("~/.cache/ofot_jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
