"""Test configuration: force an 8-device virtual CPU mesh.

The reference's CI never exercised its multi-device path (single CPU device).
Here every test runs against 8 virtual CPU devices so the sharded ensemble
path is what is actually tested.
"""

import os

import sys

# Force CPU even if the environment points at a TPU (e.g. JAX_PLATFORMS=axon):
# the test suite is designed around a deterministic 8-device virtual mesh.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8'
  ).strip()

# Persist compiled programs across suite runs: the suite is
# compile-dominated (hundreds of distinct programs, >1 s each), and the
# topology (8 virtual CPU devices) is fixed here so cache keys are stable.
# A warm cache roughly halves suite wall-clock. Opt out by setting the
# var to the empty string.
if 'JAX_COMPILATION_CACHE_DIR' not in os.environ:
  os.environ['JAX_COMPILATION_CACHE_DIR'] = os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      '.pytest_jax_cache',
  )

# Pytest plugins (e.g. jaxtyping) may import jax before this conftest runs,
# at which point jax has already bound jax_platforms from the environment —
# override it through the config API too.
if 'jax' in sys.modules:
  import jax

  jax.config.update('jax_platforms', 'cpu')

import pytest


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_between_modules():
  """Drop compiled executables after each test module.

  The full suite compiles hundreds of distinct programs into one process;
  on jax 0.9 the XLA:CPU JIT has been observed to segfault inside
  `backend_compile_and_load` only after ~200 in-process compilations
  (every module passes in isolation). Bounding the live-executable count
  keeps the process inside the regime that works. Modules rarely share
  program shapes, so the lost cache hits are negligible.
  """
  yield
  import jax

  jax.clear_caches()
