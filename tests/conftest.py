"""Test configuration: run JAX on CPU with 8 virtual devices.

This is the TPU analog of a fake distributed backend — multi-chip sharding
code paths compile and execute on an 8-device host-platform mesh
(SURVEY.md §4: the reference had no such fixture; we build one).
Must run before jax is imported anywhere.
"""

import os

# SR_TPU_TEST_PLATFORM=axon runs the selected tests on the real chip
# (the TPU registers under the 'axon' plugin name here) — needed for
# behavior CPU cannot exercise (buffer donation is a no-op warning on
# the host backend but enforced on device). Default stays cpu.
_plat = os.environ.get("SR_TPU_TEST_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", _plat)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The JAX_PLATFORMS env var alone is NOT sufficient in this image: the
# 'axon' TPU plugin registers regardless and jax silently selects the
# tunneled TPU, making every "CPU" test run over the network. The config
# update below is authoritative.
import jax  # noqa: E402

jax.config.update("jax_platforms", _plat)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
