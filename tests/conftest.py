"""Test harness: run everything on a virtual 8-device CPU mesh.

The JAX analogue of the reference's mocked process groups
(reference: mmcv/tests/test_parallel.py:2-42) — multi-chip sharding logic is
exercised without TPU hardware via xla_force_host_platform_device_count.
Must set env vars before the first jax import anywhere in the test session.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
