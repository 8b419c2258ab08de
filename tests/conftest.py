"""Test configuration: force the CPU backend with 8 virtual devices.

Tests follow the reference strategy (reference: tests/conftest.py:33-65):
real math at toy scale, mocked network/chain. Multi-chip sharding logic is
exercised on a virtual 8-device CPU mesh (XLA host-platform device count), the
TPU-era equivalent of the reference's MockSubtensor/MockDendrite fabric
(reference: base/mock.py:28-115).
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; the config knob works.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Toy problem size, matching the reference test fixture
# (reference: tests/conftest.py:26-27): scale 6 → degree-2^6 circuit,
# machines_scale 2 → 4 workers, rows of 16 coefficients.
TEST_SCALE = 6
TEST_MACHINES_SCALE = 2


@pytest.fixture(scope="session")
def rng():
    import random
    return random.Random(0xA110)
