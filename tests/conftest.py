"""Test configuration: force an 8-device virtual CPU mesh (multi-chip
sharding tests run on host; real-TPU runs happen via bench.py)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # tests always run on host CPU
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend; override back
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs
