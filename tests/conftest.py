"""Test harness config: force CPU with an 8-device virtual mesh.

SURVEY §4 item 5: multi-host / multi-chip plumbing is unit-tested without a
cluster via ``--xla_force_host_platform_device_count`` (the standard JAX
trick). Must run before jax initializes its backends, hence conftest.
"""
import os

# NOTE: this image's sitecustomize imports jax at interpreter startup to
# register the TPU relay backend, so os.environ["JAX_PLATFORMS"] here is too
# late — jax's config already latched the env. jax.config.update still works
# because no backend has been *initialized* yet at conftest time.
os.environ["JAX_PLATFORMS"] = "cpu"
if not os.environ.get("MARLGRID_NO_VIRTUAL_DEVICES"):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: this box's virtualization has multi-ms scheduling
# jitter that makes XLA:CPU compiles expensive; cache them across test runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
