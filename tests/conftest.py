"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver separately dry-runs multi-chip via __graft_entry__).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so we pin the platform via jax.config (must happen before backend init).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, jax.devices()
