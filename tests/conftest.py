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
