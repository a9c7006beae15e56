"""Test configuration.

Tests run on CPU with an 8-device virtual mesh so the sharded paths are
exercised without TPU hardware (the analog of the reference's lavapipe
software-Vulkan CI, .github/workflows/test.yml:59-88).  Pallas kernels run
in interpreter mode on CPU; on a real TPU (`AULE_TEST_TPU=1`) they compile.
"""

import os

# Must be set before the jax backend initializes.
if os.environ.get("AULE_TEST_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("AULE_TPU_INTERPRET", "1")

    # The environment's TPU plugin force-registers itself and overrides
    # JAX_PLATFORMS, so pin the platform via the config API instead.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    on_tpu = os.environ.get("AULE_TEST_TPU", "0") == "1"
    skip_tpu = pytest.mark.skip(reason="needs real TPU (set AULE_TEST_TPU=1)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
