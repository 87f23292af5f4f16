"""Test harness: force an 8-device virtual CPU platform so sharding tests
run anywhere (mirrors the driver's dryrun_multichip environment).

The axon TPU environment pre-registers its PJRT plugin from sitecustomize and
exports JAX_PLATFORMS=axon, so plain env-var overrides here are too late;
`jax.config.update` before first backend use is what actually wins."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
