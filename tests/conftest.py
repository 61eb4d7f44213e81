"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's single-process test strategy (SURVEY §4) while
letting sharded encode paths run without TPU hardware
(XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT=8, JAX_PLATFORMS=cpu).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# this image's JAX build pins the default platform to the axon TPU plugin
# regardless of JAX_PLATFORMS in the environment; the config knob works
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/tests/data")


@pytest.fixture(scope="session")
def ref_data():
    if not REFERENCE_DATA.is_dir():
        pytest.skip("reference fixture corpus not available")
    return REFERENCE_DATA
