"""Persistent XLA compile cache for every entry point.

Full-model XLA compiles cost 20-40 s each on TPU (remote relay) and
minutes on this image's single host CPU; the persistent cache makes every
run after the first effectively compile-free.  ``bench.py`` and
``tests/conftest.py`` set their own cache dirs; this helper covers the
user-facing entry points (``scripts/main.py`` / ``scripts/eval.py`` via
the Trainer constructors).  The cache key includes the platform and
program hash, so one directory safely serves CPU and TPU runs.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently point JAX at a persistent compilation cache."""
    global _DONE
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/jax_cache")
    if not _DONE:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _DONE = True
    return path
