"""Persistent-compilation-cache setup shared by the CLI entry points.

TPU and CPU executables must not share a cache directory: CPU AOT entries
are machine-feature-specific (a cache populated on another host loads with
feature-mismatch errors and falls back SLOWLY, or worse), while the TPU
cache is precious (full-size graphs take minutes to compile through the
remote-compile tunnel). The backend is decided by JAX_PLATFORMS before jax
initializes, so the split is env-based.

``CCD_PLATFORM=cpu`` forces the CPU backend from the CLIs even on hosts
whose site startup pins ``JAX_PLATFORMS`` to an accelerator plugin before
user code runs (shell-level ``JAX_PLATFORMS=cpu`` is clobbered there); it
uses ``jax.config.update`` which wins as long as no backend has initialized.
``CCD_HOST_DEVICES=N`` additionally creates N virtual CPU devices (the
multi-device test topology).
"""

from __future__ import annotations

import os


def setup_compilation_cache(repo_file: str) -> None:
    """Apply CCD_PLATFORM/CCD_HOST_DEVICES overrides and point jax's
    persistent cache at .jax_cache (TPU) or .jax_cache_cpu (CPU) next to
    ``repo_file``; never raises."""
    import jax
    is_cpu = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    forced = os.environ.get("CCD_PLATFORM")
    if forced:
        is_cpu = forced.startswith("cpu")
        try:
            jax.config.update("jax_platforms", forced)
        except Exception:
            pass
    n_host = os.environ.get("CCD_HOST_DEVICES")
    if n_host:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_host}")
    root = os.path.dirname(os.path.abspath(repo_file))
    cache = os.path.join(root, ".jax_cache_cpu" if is_cpu else ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
