"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware (SURVEY.md §4 test strategy).

This image's sitecustomize registers the axon TPU backend at interpreter
startup (/root/.axon_site/sitecustomize.py), so the default backend cannot be
switched off — but the CPU client initializes lazily and reads XLA_FLAGS at
first use. We set the virtual-device flag here (before anything touches the
CPU client) and route all computation to CPU via jax_default_device. Eager
ops on the tunneled TPU would be glacial; on CPU the suite is fast.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
# Make the attention dispatcher take the XLA path (tests exercise the Pallas
# kernel explicitly through interpret mode).
os.environ.setdefault("IMAGDRESSING_DISABLE_PALLAS", "1")

import jax  # noqa: E402

# The axon plugin registers at interpreter start (before conftest), so the
# env var JAX_PLATFORMS=axon was already captured by jax's config at import.
# Overriding the config value (selection is still lazy at this point) keeps
# `jax.devices()` on the 8-device virtual CPU mesh even when the suite is
# launched with the tunnel env vars set — otherwise mesh-building tests see
# the single real chip and fail (r3 round-start full-suite run).
jax.config.update("jax_platforms", "cpu")

_CPUS = jax.devices("cpu")
jax.config.update("jax_default_device", _CPUS[0])
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the suite compiles ~30 sizeable CPU programs
# (tiny-UNet pipelines, sharded train steps); cached reruns cut minutes.
_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, ".xla_cache_cpu")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return _CPUS


def pytest_report_header(config):
    return (
        f"jax default backend: {jax.default_backend()}, "
        f"cpu devices: {len(_CPUS)}"
    )
