"""Test harness: force an 8-device CPU platform so sharding/collective code
paths run without TPU hardware. Must set env vars before jax is imported."""

import os

# Force CPU even when the session environment points at a TPU platform —
# unit tests need determinism + fp32 matmuls, and the virtual 8-device CPU
# platform exercises the sharding code paths.
#
# NOTE: the environment may import jax at interpreter startup (sitecustomize
# registering a TPU PJRT plugin), so mutating os.environ["JAX_PLATFORMS"]
# here is too late — use jax.config, which wins as long as no backend has
# been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: the pretrain-step test graphs take ~1-2 min
# each to compile on CPU; repeat suite runs hit the cache
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_cpu")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass
