"""Persistent compilation cache setup (ROADMAP #6 / VERDICT r1 weak #7).

The axon PJRT backend compiles through a remote service (30-350 s for the
full pipeline). JAX's persistent compilation cache works with it: cache
entries are written and hit across processes (verified by
``apps/probe_compile_cache.py``), cutting repeat process start for the probe
workload from ~250 s to ~60-130 s; the residual is executable load/claim
through the relay, not recompilation.

Call :func:`enable_compilation_cache` before the first ``jax.jit`` (bench.py
and the apps do). The cache directory defaults to ``<repo>/.jax_cache`` and
can be overridden with ``XSLAM_JAX_CACHE_DIR``.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    # Only cache for the remote (axon/TPU) backend: CPU executables are
    # AOT-compiled against exact machine features and XLA loads mismatched
    # entries with a SIGILL warning (observed when a cache written under
    # different flags was reused), and CPU compiles are fast anyway.
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend not in ("axon", "tpu"):
        return ""

    if cache_dir is None:
        cache_dir = os.environ.get("XSLAM_JAX_CACHE_DIR")
    if cache_dir is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(repo, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
