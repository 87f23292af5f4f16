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

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _tmp_safe_root(tmp_path):
    """Serving routes validate user-supplied paths against the safe root
    (utils.path_safety, the reference's training path_safety pattern).
    Tests operate in tmp_path, so scope the root there — exactly what the
    reference's data_module tests do with set_safe_root."""
    from acestep_tpu.utils.path_safety import get_safe_root, set_safe_root
    old = get_safe_root()
    set_safe_root(str(tmp_path))
    yield
    set_safe_root(old)
