"""Test harness: run everything on a virtual 8-device CPU mesh.

The JAX analogue of the reference's mocked process groups
(reference: mmcv/tests/test_parallel.py:2-42) — multi-chip sharding logic is
exercised without TPU hardware via xla_force_host_platform_device_count.
Must set env vars before the first jax import anywhere in the test session.
"""

import os

# The container's sitecustomize registers the axon TPU backend and pins
# JAX_PLATFORMS=axon before pytest starts, so a plain env setdefault is too
# late — override both the env and the already-imported jax config.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# persistent compile cache: repeated suite runs skip recompilation
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
assert jax.devices()[0].platform == 'cpu', 'tests must run on host CPU'
assert jax.device_count() == 8, 'tests expect an 8-device virtual mesh'

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
