"""Persistent-compilation-cache setup shared by the CLI entry points.

TPU and CPU executables must not share a cache directory: CPU AOT entries
are machine-feature-specific (a cache populated on another host loads with
feature-mismatch errors and falls back SLOWLY, or worse), while the TPU
cache is precious (full-size graphs take minutes to compile through the
remote-compile tunnel). The backend is decided by JAX_PLATFORMS before jax
initializes, so the split is env-based.
"""

from __future__ import annotations

import os


def setup_compilation_cache(repo_file: str) -> None:
    """Point jax's persistent cache at .jax_cache (TPU) or .jax_cache_cpu
    (CPU) next to ``repo_file``; never raises."""
    import jax
    root = os.path.dirname(os.path.abspath(repo_file))
    is_cpu = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    cache = os.path.join(root, ".jax_cache_cpu" if is_cpu else ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
