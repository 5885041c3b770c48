"""Persistent-compile-cache setup that actually works on this machine.

The obvious ``JAX_COMPILATION_CACHE_DIR`` env var is read when jax is
imported — but the axon site hook imports jax from ``sitecustomize`` at
interpreter startup, BEFORE any user code runs, so setting the env var
inside a script silently does nothing and every process pays the remote
compile again (minutes per executable through the tunnel).
``jax.config.update`` works at any time; use this helper instead.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_cache(path: str | os.PathLike | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point JAX at a persistent compilation cache directory (created on
    first write).  Default: $JAX_COMPILATION_CACHE_DIR, else .jax_cache
    next to the repository/package root."""
    import jax

    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        path = Path(__file__).resolve().parents[2] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return str(path)
