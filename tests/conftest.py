"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use `xla_force_host_platform_device_count`, the
standard JAX analog of a fake backend (SURVEY.md §4).

Environment note: this container's sitecustomize (PYTHONPATH
/root/.axon_site) imports jax and registers the remote `axon` TPU backend at
interpreter startup — *before* pytest loads conftest — so setting
JAX_PLATFORMS via os.environ here is too late. `jax.config.update` after
import does take effect as long as no backend has been initialized yet.
"""

import os

# XLA_FLAGS is read lazily at first CPU-client creation, so this still works.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute CPU integration runs")
